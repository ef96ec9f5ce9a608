from ark_tpu.io import io_utils, load_utils, image_utils, misc_utils  # noqa: F401
