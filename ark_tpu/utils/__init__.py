from ark_tpu.utils.labeled_array import DataArray  # noqa: F401
