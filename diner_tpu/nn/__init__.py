from diner_tpu.nn.posenc import posenc, posenc_dim
from diner_tpu.nn.resnetfc import ResnetFC
from diner_tpu.nn.resnet import ResNetTrunk
from diner_tpu.nn.spatial_encoder import SpatialEncoder
from diner_tpu.nn.vgg import Vgg19Features

__all__ = [
    "posenc",
    "posenc_dim",
    "ResnetFC",
    "ResNetTrunk",
    "SpatialEncoder",
    "Vgg19Features",
]
