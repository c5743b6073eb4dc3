"""Model zoo: image encoder, KPConv point branch, I2P transformer, CoFiI2P."""

from cofii2p_tpu.models.network import CoFiI2P

__all__ = ["CoFiI2P"]
