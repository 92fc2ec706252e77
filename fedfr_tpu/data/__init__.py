from .recordio import (
    IRHeader,
    IndexedRecordReader,
    IndexedRecordWriter,
    SplitMeta,
    pack,
    read_split_meta,
    unpack,
    write_split,
)
from .datasets import AllClientData, BatchLoader, CombinedDataset, FaceRecordDataset
from . import codec

__all__ = [
    "IRHeader",
    "IndexedRecordReader",
    "IndexedRecordWriter",
    "SplitMeta",
    "pack",
    "read_split_meta",
    "unpack",
    "write_split",
    "AllClientData",
    "BatchLoader",
    "CombinedDataset",
    "FaceRecordDataset",
    "codec",
]
