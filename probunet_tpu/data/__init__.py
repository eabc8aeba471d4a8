from probunet_tpu.data.transforms import (
    softplus,
    softplus_inv,
    kgm2s_to_mmday,
    k_to_c,
    apply_physical_transform,
    invert_physical_transform,
)
from probunet_tpu.data.synthetic import synthetic_climex_fields
from probunet_tpu.data.climex import ClimexDataset, Standardization
from probunet_tpu.data.loader import Batches, prefetch_to_device

__all__ = [
    "softplus",
    "softplus_inv",
    "kgm2s_to_mmday",
    "k_to_c",
    "apply_physical_transform",
    "invert_physical_transform",
    "synthetic_climex_fields",
    "ClimexDataset",
    "Standardization",
    "Batches",
    "prefetch_to_device",
]
