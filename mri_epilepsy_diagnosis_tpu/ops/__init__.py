from .functional import (
    conv3d, conv3d_transpose, conv2d, maxpool3d, maxpool2d, avgpool3d,
    resize_linear, resize_nearest, prelu, batch_norm, instance_norm,
    group_norm, pad_to, crop_or_pad,
)

__all__ = [
    "conv3d", "conv3d_transpose", "conv2d", "maxpool3d", "maxpool2d",
    "avgpool3d", "resize_linear", "resize_nearest", "prelu", "batch_norm",
    "instance_norm", "group_norm", "pad_to", "crop_or_pad",
]
