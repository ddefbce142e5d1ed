from siss_tpu.data.samplers import InfiniteSampler, RepeatedSampler
from siss_tpu.data.datasets import (
    ArrayDataset,
    ImageFolderDataset,
    LabeledImageDataset,
    SDData,
    normalize_to_unit_range,
)
from siss_tpu.data.loader import BatchLoader, dual_stream
from siss_tpu.data.synthetic import make_synthetic_mnist_tshirt

__all__ = [
    "InfiniteSampler",
    "RepeatedSampler",
    "ArrayDataset",
    "ImageFolderDataset",
    "LabeledImageDataset",
    "SDData",
    "normalize_to_unit_range",
    "BatchLoader",
    "dual_stream",
    "make_synthetic_mnist_tshirt",
]
