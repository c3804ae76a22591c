"""Independent PyTorch reference implementation of the SNAC decoder.

Used only by tests as a numerical cross-check for the JAX vocoder and as a
generator of official-style state dicts (same module naming as the public
`snac` package, so `loader.load_snac_torch_state` is exercised exactly as it
would be on a released checkpoint). Written from the architecture description
in SURVEY.md §2.2 / public SNAC docs — not a copy of reference-repo code
(the reference repo contains no SNAC source).
"""

import math

import torch
import torch.nn as nn
from torch.nn.utils import weight_norm


def WNConv1d(*a, **kw):
    return weight_norm(nn.Conv1d(*a, **kw))


def WNConvTranspose1d(*a, **kw):
    return weight_norm(nn.ConvTranspose1d(*a, **kw))


class Snake1d(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, dim, 1))

    def forward(self, x):
        return x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)


class ResidualUnit(nn.Module):
    def __init__(self, dim, dilation=1, kernel=7, groups=1):
        super().__init__()
        pad = ((kernel - 1) * dilation) // 2
        self.block = nn.Sequential(
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=kernel, dilation=dilation,
                     padding=pad, groups=groups),
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=1),
        )

    def forward(self, x):
        return x + self.block(x)


class NoiseBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = WNConv1d(dim, dim, kernel_size=1, bias=False)

    def forward(self, x):
        B, C, T = x.shape
        noise = torch.randn(B, 1, T, device=x.device, dtype=x.dtype)
        return x + noise * self.linear(x)


class DecoderBlock(nn.Module):
    def __init__(self, input_dim, output_dim, stride, noise, groups=1):
        super().__init__()
        layers = [
            Snake1d(input_dim),
            WNConvTranspose1d(
                input_dim, output_dim, kernel_size=2 * stride, stride=stride,
                padding=math.ceil(stride / 2), output_padding=stride % 2,
            ),
        ]
        layers.append(NoiseBlock(output_dim) if noise else nn.Identity())
        layers += [
            ResidualUnit(output_dim, dilation=1, groups=groups),
            ResidualUnit(output_dim, dilation=3, groups=groups),
            ResidualUnit(output_dim, dilation=9, groups=groups),
        ]
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        return self.block(x)


class Decoder(nn.Module):
    def __init__(self, input_channel, channels, rates, noise=False,
                 depthwise=False, d_out=1):
        super().__init__()
        if depthwise:
            layers = [
                WNConv1d(input_channel, input_channel, kernel_size=7,
                         padding=3, groups=input_channel),
                WNConv1d(input_channel, channels, kernel_size=1),
            ]
        else:
            layers = [WNConv1d(input_channel, channels, kernel_size=7, padding=3)]
        for i, stride in enumerate(rates):
            input_dim = channels // 2**i
            output_dim = channels // 2 ** (i + 1)
            groups = output_dim if depthwise else 1
            layers.append(DecoderBlock(input_dim, output_dim, stride, noise,
                                       groups=groups))
        layers += [
            Snake1d(output_dim),
            WNConv1d(output_dim, d_out, kernel_size=7, padding=3),
            nn.Tanh(),
        ]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class VectorQuantize(nn.Module):
    def __init__(self, input_dim, codebook_size, codebook_dim, stride=1):
        super().__init__()
        self.stride = stride
        self.codebook = nn.Embedding(codebook_size, codebook_dim)
        self.out_proj = WNConv1d(codebook_dim, input_dim, kernel_size=1)

    def decode_code(self, embed_id):
        return self.codebook(embed_id).transpose(1, 2)  # (B, cd, T)

    def from_code(self, codes):
        z = self.out_proj(self.decode_code(codes))
        if self.stride > 1:
            z = z.repeat_interleave(self.stride, dim=-1)
        return z


class ResidualVectorQuantize(nn.Module):
    def __init__(self, input_dim, codebook_size, codebook_dim, vq_strides):
        super().__init__()
        self.quantizers = nn.ModuleList(
            [VectorQuantize(input_dim, codebook_size, codebook_dim, s)
             for s in vq_strides]
        )

    def from_codes(self, codes):
        z = 0.0
        for q, c in zip(self.quantizers, codes):
            z = z + q.from_code(c)
        return z


class TorchSnacRef(nn.Module):
    """decode()-only SNAC (no encoder — the serving stack never encodes)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.quantizer = ResidualVectorQuantize(
            cfg.latent_dim, cfg.codebook_size, cfg.codebook_dim,
            list(cfg.vq_strides),
        )
        self.decoder = Decoder(
            cfg.latent_dim, cfg.decoder_dim, list(cfg.decoder_rates),
            noise=cfg.noise, depthwise=cfg.depthwise,
        )

    @torch.inference_mode()
    def decode(self, codes):
        z_q = self.quantizer.from_codes(codes)
        return self.decoder(z_q)
