"""Feather read/write via pyarrow (the reference stores per-FOV pixel matrices
and SOM weights as feather files; `cluster_helpers.py:116`, pixie stages)."""

from __future__ import annotations

import pandas as pd
from pyarrow import feather as _pa_feather


def write_dataframe(df: pd.DataFrame, path, compression: str = "uncompressed"):
    _pa_feather.write_feather(df, str(path), compression=compression)


def read_dataframe(path) -> pd.DataFrame:
    return _pa_feather.read_feather(str(path))


def read_column_names(path) -> list:
    """Column names of a feather file without reading its data (the resume
    detector schema-checks every per-FOV file; a full read per FOV would
    make restart cost scale with cohort size)."""
    import pyarrow.ipc as _ipc

    with _ipc.open_file(str(path)) as reader:
        return reader.schema.names
