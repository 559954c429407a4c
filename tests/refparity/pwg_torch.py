"""Torch implementation of the ParallelWaveGAN modules the reference imports.

The reference (crank/net/module/vqvae2.py:17, crank/net/module/spkradv.py:14,
crank/bin/train.py:24-27) builds its encoder/decoder/discriminator networks
from the pip package ``parallel_wavegan``, which is not installed here.  This
module provides first-party torch implementations of the same architecture —
written from the layer spec that crank_tpu's flax models were designed to
(crank_tpu/models/layers.py, models/wavenet.py, models/discriminator.py) —
so that the reference's own VQVAE2 / SpeakerAdversarialNetwork / trainer code
can be imported and executed for numerical parity testing.

Architecture spec (non-causal/causal WaveNet):
* first 1x1 conv -> ``layers`` gated residual blocks with dilation cycling
  2**(i % (layers//stacks)) -> skip-sum * sqrt(1/layers) -> ReLU -> 1x1 ->
  ReLU -> 1x1.
* residual block: dilated conv to ``gate_channels``, channel-halved
  tanh/sigmoid gate, optional bias-free 1x1 aux conv added pre-gate,
  1x1 skip and 1x1 residual projections, (out + residual) * sqrt(0.5).
* plain discriminator: (layers-1) x [dilated conv (dilation i) + LeakyReLU]
  + final conv, dilation_factor**i when dilation_factor != 1.
* residual discriminator: 1x1 + LeakyReLU front, residual blocks without
  aux, skip-sum * sqrt(1/layers), [LeakyReLU, 1x1, LeakyReLU, 1x1] head.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import remove_weight_norm, weight_norm


def _dilations(layers: int, stacks: int):
    per = layers // stacks
    return [2 ** (i % per) for i in range(layers)]


class Conv1d1x1(nn.Conv1d):
    def __init__(self, in_channels, out_channels, bias=True):
        super().__init__(in_channels, out_channels, 1, bias=bias)


class ResidualBlock(nn.Module):
    def __init__(
        self,
        kernel_size=3,
        residual_channels=64,
        gate_channels=128,
        skip_channels=64,
        aux_channels=0,
        dropout=0.0,
        dilation=1,
        bias=True,
        use_causal_conv=False,
    ):
        super().__init__()
        self.dropout = dropout
        self.use_causal_conv = use_causal_conv
        if use_causal_conv:
            padding = (kernel_size - 1) * dilation
        else:
            assert (kernel_size - 1) % 2 == 0
            padding = (kernel_size - 1) // 2 * dilation
        self.conv = nn.Conv1d(
            residual_channels,
            gate_channels,
            kernel_size,
            padding=padding,
            dilation=dilation,
            bias=bias,
        )
        if aux_channels > 0:
            self.conv1x1_aux = Conv1d1x1(aux_channels, gate_channels, bias=False)
        else:
            self.conv1x1_aux = None
        gate_out = gate_channels // 2
        self.conv1x1_out = Conv1d1x1(gate_out, residual_channels, bias=bias)
        self.conv1x1_skip = Conv1d1x1(gate_out, skip_channels, bias=bias)

    def forward(self, x, c=None):
        residual = x
        x = F.dropout(x, p=self.dropout, training=self.training)
        x = self.conv(x)
        if self.use_causal_conv:
            x = x[:, :, : residual.size(-1)]
        xa, xb = x.split(x.size(1) // 2, dim=1)
        if c is not None:
            assert self.conv1x1_aux is not None
            c = self.conv1x1_aux(c)
            ca, cb = c.split(c.size(1) // 2, dim=1)
            xa, xb = xa + ca, xb + cb
        x = torch.tanh(xa) * torch.sigmoid(xb)
        s = self.conv1x1_skip(x)
        x = (self.conv1x1_out(x) + residual) * math.sqrt(0.5)
        return x, s


class ParallelWaveGANGenerator(nn.Module):
    def __init__(
        self,
        in_channels=1,
        out_channels=1,
        kernel_size=3,
        layers=30,
        stacks=3,
        residual_channels=64,
        gate_channels=128,
        skip_channels=64,
        aux_channels=80,
        aux_context_window=2,
        dropout=0.0,
        bias=True,
        use_weight_norm=True,
        use_causal_conv=False,
        upsample_conditional_features=True,
        upsample_net="ConvInUpsampleNetwork",
        upsample_params={},
    ):
        super().__init__()
        assert not upsample_conditional_features, (
            "the reference always disables upsampling (vqvae2.py:252,271)"
        )
        self.kernel_size = kernel_size
        self.layers = layers
        self.stacks = stacks
        self.first_conv = Conv1d1x1(in_channels, residual_channels, bias=True)
        self.conv_layers = nn.ModuleList(
            [
                ResidualBlock(
                    kernel_size=kernel_size,
                    residual_channels=residual_channels,
                    gate_channels=gate_channels,
                    skip_channels=skip_channels,
                    aux_channels=aux_channels,
                    dilation=d,
                    dropout=dropout,
                    bias=bias,
                    use_causal_conv=use_causal_conv,
                )
                for d in _dilations(layers, stacks)
            ]
        )
        self.last_conv_layers = nn.ModuleList(
            [
                nn.ReLU(inplace=True),
                Conv1d1x1(skip_channels, skip_channels, bias=True),
                nn.ReLU(inplace=True),
                Conv1d1x1(skip_channels, out_channels, bias=True),
            ]
        )
        if use_weight_norm:
            self.apply_weight_norm()

    def forward(self, x, c=None):
        x = self.first_conv(x)
        skips = 0
        for f in self.conv_layers:
            x, h = f(x, c)
            skips += h
        skips *= math.sqrt(1.0 / len(self.conv_layers))
        x = skips
        for f in self.last_conv_layers:
            x = f(x)
        return x

    def apply_weight_norm(self):
        def _apply(m):
            if isinstance(m, (nn.Conv1d, nn.Conv2d)):
                weight_norm(m)

        self.apply(_apply)

    def remove_weight_norm(self):
        def _remove(m):
            try:
                remove_weight_norm(m)
            except ValueError:
                pass

        self.apply(_remove)

    @property
    def receptive_field_size(self):
        return (self.kernel_size - 1) * sum(
            _dilations(self.layers, self.stacks)
        ) + 1


class ParallelWaveGANDiscriminator(nn.Module):
    def __init__(
        self,
        in_channels=1,
        out_channels=1,
        kernel_size=3,
        layers=10,
        conv_channels=64,
        dilation_factor=1,
        nonlinear_activation="LeakyReLU",
        nonlinear_activation_params={"negative_slope": 0.2},
        bias=True,
        use_weight_norm=True,
    ):
        super().__init__()
        assert (kernel_size - 1) % 2 == 0
        assert dilation_factor > 0
        self.conv_layers = nn.ModuleList()
        conv_in_channels = in_channels
        for i in range(layers - 1):
            if i == 0:
                dilation = 1
            else:
                dilation = (
                    i if dilation_factor == 1 else dilation_factor**i
                )
                conv_in_channels = conv_channels
            padding = (kernel_size - 1) // 2 * dilation
            self.conv_layers += [
                nn.Conv1d(
                    conv_in_channels,
                    conv_channels,
                    kernel_size,
                    padding=padding,
                    dilation=dilation,
                    bias=bias,
                ),
                getattr(nn, nonlinear_activation)(
                    inplace=True, **nonlinear_activation_params
                ),
            ]
        padding = (kernel_size - 1) // 2
        self.conv_layers += [
            nn.Conv1d(
                conv_channels, out_channels, kernel_size,
                padding=padding, bias=bias,
            )
        ]
        if use_weight_norm:
            self.apply_weight_norm()

    def forward(self, x):
        for f in self.conv_layers:
            x = f(x)
        return x

    def apply_weight_norm(self):
        def _apply(m):
            if isinstance(m, (nn.Conv1d, nn.Conv2d)):
                weight_norm(m)

        self.apply(_apply)

    def remove_weight_norm(self):
        def _remove(m):
            try:
                remove_weight_norm(m)
            except ValueError:
                pass

        self.apply(_remove)


class ResidualParallelWaveGANDiscriminator(nn.Module):
    def __init__(
        self,
        in_channels=1,
        out_channels=1,
        kernel_size=3,
        layers=30,
        stacks=3,
        residual_channels=64,
        gate_channels=128,
        skip_channels=64,
        dropout=0.0,
        bias=True,
        use_weight_norm=True,
        use_causal_conv=False,
        nonlinear_activation="LeakyReLU",
        nonlinear_activation_params={"negative_slope": 0.2},
    ):
        super().__init__()
        assert (kernel_size - 1) % 2 == 0
        self.layers = layers
        self.first_conv = nn.Sequential(
            Conv1d1x1(in_channels, residual_channels, bias=True),
            getattr(nn, nonlinear_activation)(
                inplace=True, **nonlinear_activation_params
            ),
        )
        self.conv_layers = nn.ModuleList(
            [
                ResidualBlock(
                    kernel_size=kernel_size,
                    residual_channels=residual_channels,
                    gate_channels=gate_channels,
                    skip_channels=skip_channels,
                    aux_channels=0,
                    dilation=d,
                    dropout=dropout,
                    bias=bias,
                    use_causal_conv=use_causal_conv,
                )
                for d in _dilations(layers, stacks)
            ]
        )
        self.last_conv_layers = nn.ModuleList(
            [
                getattr(nn, nonlinear_activation)(
                    inplace=True, **nonlinear_activation_params
                ),
                Conv1d1x1(skip_channels, skip_channels, bias=True),
                getattr(nn, nonlinear_activation)(
                    inplace=True, **nonlinear_activation_params
                ),
                Conv1d1x1(skip_channels, out_channels, bias=True),
            ]
        )
        if use_weight_norm:
            self.apply_weight_norm()

    def forward(self, x):
        x = self.first_conv(x)
        skips = 0
        for f in self.conv_layers:
            x, h = f(x, None)
            skips += h
        skips *= math.sqrt(1.0 / len(self.conv_layers))
        x = skips
        for f in self.last_conv_layers:
            x = f(x)
        return x

    def apply_weight_norm(self):
        def _apply(m):
            if isinstance(m, (nn.Conv1d, nn.Conv2d)):
                weight_norm(m)

        self.apply(_apply)

    def remove_weight_norm(self):
        def _remove(m):
            try:
                remove_weight_norm(m)
            except ValueError:
                pass

        self.apply(_remove)
