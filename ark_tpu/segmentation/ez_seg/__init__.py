from ark_tpu.segmentation.ez_seg import (composites,  # noqa: F401
                                         ez_object_segmentation,
                                         ez_seg_display, ez_seg_utils,
                                         merge_masks)
