"""Data pipeline: host loaders (NumPy IO) + on-device sample preparation."""

from cofii2p_tpu.data.device_pipeline import prepare_samples
from cofii2p_tpu.data.synthetic import SyntheticDataset

__all__ = ["prepare_samples", "SyntheticDataset"]
