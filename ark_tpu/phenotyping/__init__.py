from ark_tpu.phenotyping import cluster_helpers  # noqa: F401
