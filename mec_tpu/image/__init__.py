"""Image decode / resize / normalize for the image emotion path."""

from mec_tpu.image.preprocess import (  # noqa: F401
    load_image_for_model, IMAGENET_MEAN, IMAGENET_STD)
