"""Data layer: file/synthetic image datasets, the native code store that
replaces LMDB, SYSU-MM01 loaders, and P×K identity samplers."""
