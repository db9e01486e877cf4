"""VGG19 feature tower for perceptual losses and LPIPS.

Behavioral reference: src/losses/vggloss.py:11-46 (Vgg19 slices at torchvision
`features` indices 2/7/12/21, i.e. after relu1_1, relu2_1, relu3_1, relu4_1)
and the LPIPS-VGG backbone (src/evaluation/eval_suite.py:52). Weights can be
ported from a torchvision state_dict via diner_tpu.nn.torch_port; without a
checkpoint the tower runs with random init (useful only for wiring tests).

NHWC, convs 3x3 pad 1, maxpool 2x2/2 — the standard VGG19 feature stack.
"""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn

# torchvision vgg19.features layout: conv indices per stage.
_VGG19_CFG = (2, 2, 4, 4, 4)  # convs per stage (stages separated by maxpool)
_VGG19_CH = (64, 128, 256, 512, 512)


class Vgg19Features(nn.Module):
    """Returns activations after the first relu of stages 1..n_slices.

    Slice boundaries match the reference VGGLoss: [relu1_1, relu2_1, relu3_1,
    relu4_1] — torchvision features[0:2], [2:7], [7:12], [12:21].
    """

    n_slices: int = 4

    @nn.compact
    def __call__(self, x) -> Sequence:
        outs = []
        # slice1: conv1_1 + relu
        x = nn.relu(nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], name="conv1_1")(x))
        outs.append(x)
        # slice2: conv1_2+relu, pool, conv2_1+relu
        x = nn.relu(nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], name="conv1_2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)], name="conv2_1")(x))
        outs.append(x)
        # slice3: conv2_2+relu, pool, conv3_1+relu
        x = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)], name="conv2_2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="conv3_1")(x))
        outs.append(x)
        # slice4: conv3_2..conv3_4+relu, pool, conv4_1+relu
        for i in (2, 3, 4):
            x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                                name=f"conv3_{i}")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)], name="conv4_1")(x))
        outs.append(x)
        return outs[: self.n_slices]
