from .storage import (
    AttributeDict,
    CompressedStorage,
    MeshStorage,
    SkeletonStorage,
    VoxelStorage,
    VoxelStorageClass,
    VoxelStorageDyn,
    VoxelStorageL,
    VoxelStorageLazyLoading,
)
from .bst import BinarySearchStore

__all__ = [
    "AttributeDict",
    "CompressedStorage",
    "MeshStorage",
    "SkeletonStorage",
    "VoxelStorage",
    "VoxelStorageClass",
    "VoxelStorageDyn",
    "VoxelStorageL",
    "VoxelStorageLazyLoading",
    "BinarySearchStore",
]
