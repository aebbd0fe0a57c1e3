from .dataset import P3Dataset, load_image_file, load_lidar_file
from .loader import Loader, build_loader, collate
from .synthetic import ensure_synthetic_dataset, generate_tile, write_synthetic_dataset

__all__ = [
    "P3Dataset",
    "Loader",
    "build_loader",
    "collate",
    "ensure_synthetic_dataset",
    "generate_tile",
    "write_synthetic_dataset",
    "load_image_file",
    "load_lidar_file",
]
