#!/usr/bin/env python
"""Torch-CPU baseline proxy for bench.py's vs_baseline multiple.

The reference cannot train on CPU (crank/bin/train.py:158-159 asserts a GPU)
and publishes no throughput numbers, so bench.py compares against THIS
script: a torch implementation of the same vqvae trainer step at the same
production geometry (batch 50 x 500 frames x 80-dim mlfb, two VQ stacks of
gated dilated WaveNet encoders/decoders with the template default.yml
channel/layer counts, EMA codebooks, speaker-adversarial + classifier
updates, l1 + multi-resolution feature STFT losses, three Adam steps),
with OMP_NUM_THREADS=1 as the reference's path.sh sets.

Run on the benchmark host to reproduce bench.py's
BASELINE_CPU_FRAMES_PER_SEC:

    OMP_NUM_THREADS=1 python benchmarks/torch_cpu_baseline.py

Approximations vs the reference (documented, all in the baseline's FAVOR —
they make the torch step cheaper): no weight-norm reparameterization, no
dropout, no cycle path, single STFT window pair.
"""

import argparse
import json
import os
import time

import torch
import torch.nn.functional as F

# --threads 1 reproduces the reference's path.sh OMP_NUM_THREADS=1 row;
# --threads 0 uses every core (bench.py's vs_baseline_allcore row).
_ap = argparse.ArgumentParser()
_ap.add_argument("--threads", type=int, default=1)
_args = _ap.parse_args()
torch.set_num_threads(_args.threads or os.cpu_count())

B, T, D = 50, 500, 80
SPKRS = 4
EMB_DIM, EMB_SIZE = 64, 512


class GatedBlock(torch.nn.Module):
    def __init__(self, ch, kernel, dilation, aux):
        super().__init__()
        pad = (kernel - 1) // 2 * dilation
        self.conv = torch.nn.Conv1d(ch, 2 * ch, kernel, padding=pad,
                                    dilation=dilation)
        self.aux = torch.nn.Conv1d(aux, 2 * ch, 1) if aux else None
        self.res = torch.nn.Conv1d(ch, ch, 1)
        self.skip = torch.nn.Conv1d(ch, ch, 1)

    def forward(self, x, c=None):
        h = self.conv(x)
        if self.aux is not None and c is not None:
            h = h + self.aux(c)
        a, b = h.chunk(2, dim=1)
        h = torch.tanh(a) * torch.sigmoid(b)
        return x + self.res(h), self.skip(h)


class WaveNet(torch.nn.Module):
    def __init__(self, in_ch, out_ch, layers, stacks, kernel, aux=0):
        super().__init__()
        self.inp = torch.nn.Conv1d(in_ch, 64, 1)
        self.blocks = torch.nn.ModuleList([
            GatedBlock(64, kernel, 2 ** (i % layers), aux)
            for s in range(stacks) for i in range(layers)
        ])
        self.out = torch.nn.Sequential(
            torch.nn.ReLU(), torch.nn.Conv1d(64, 64, 1),
            torch.nn.ReLU(), torch.nn.Conv1d(64, out_ch, 1),
        )

    def forward(self, x, c=None):
        x = self.inp(x)
        skips = 0
        for blk in self.blocks:
            x, s = blk(x, c)
            skips = skips + s
        return self.out(skips)


class Proxy(torch.nn.Module):
    """Two-stack hierarchical VQ-VAE + GRL speaker classifier + classifier
    (geometry: n_layers [2,2], n_layers_stacks [4,3], kernel 5/3,
    template/conf/default.yml)."""

    def __init__(self):
        super().__init__()
        self.enc0 = WaveNet(D, EMB_DIM, 2, 4, 5)
        self.enc1 = WaveNet(EMB_DIM, EMB_DIM, 2, 3, 3)
        self.dec1 = WaveNet(EMB_DIM, EMB_DIM, 2, 3, 3, aux=SPKRS + 1)
        self.dec0 = WaveNet(2 * EMB_DIM, D, 2, 4, 5, aux=SPKRS + 1)
        self.book0 = torch.nn.Parameter(torch.randn(EMB_SIZE, EMB_DIM))
        self.book1 = torch.nn.Parameter(torch.randn(EMB_SIZE, EMB_DIM))
        self.spkradv = WaveNet(2 * EMB_DIM, SPKRS, 2, 3, 3)
        self.classifier = WaveNet(D, SPKRS, 1, 8, 5)

    @staticmethod
    def vq(z, book):
        zt = z.transpose(1, 2).reshape(-1, EMB_DIM)
        d = (zt.pow(2).sum(1, keepdim=True) - 2 * zt @ book.t()
             + book.pow(2).sum(1))
        idx = d.argmin(1)
        q = book[idx].reshape(z.shape[0], -1, EMB_DIM).transpose(1, 2)
        return z + (q - z).detach(), F.mse_loss(z, q.detach())

    def forward(self, x, h):
        e0 = self.enc0(x)
        e1 = self.enc1(e0)
        q1, c1 = self.vq(e1, self.book1)
        d1 = self.dec1(q1, h)
        q0, c0 = self.vq(e0 + d1, self.book0)
        y = self.dec0(torch.cat([q0, q1], 1), h)
        adv = self.spkradv(torch.cat([e0, e1], 1).detach())
        return y, c0 + c1, adv


def stft_loss(y, t):
    loss = 0.0
    for n_fft, hop in ((64, 16), (128, 32)):
        ys = torch.stft(y.reshape(-1, y.shape[-1]), n_fft, hop,
                        return_complex=True).abs()
        ts = torch.stft(t.reshape(-1, t.shape[-1]), n_fft, hop,
                        return_complex=True).abs()
        loss = loss + F.l1_loss(ys, ts)
    return loss


def main():
    model = Proxy()
    clf_opt = torch.optim.Adam(model.classifier.parameters(), 1e-4)
    adv_opt = torch.optim.Adam(model.spkradv.parameters(), 1e-4)
    g_params = [p for n, p in model.named_parameters()
                if not n.startswith(("classifier", "spkradv"))]
    g_opt = torch.optim.Adam(g_params, 2e-4)

    x = torch.randn(B, D, T)
    h = torch.randn(B, SPKRS + 1, T)
    labels = torch.randint(0, SPKRS, (B, T))

    def step():
        y, commit, adv = model(x, h)
        g_loss = (2 * F.l1_loss(y, x) + stft_loss(y, x) + 0.25 * commit
                  - 0.1 * F.cross_entropy(adv, labels))  # GRL role
        g_opt.zero_grad()
        g_loss.backward()
        g_opt.step()

        _, _, adv = model(x, h)
        adv_loss = F.cross_entropy(adv, labels)
        adv_opt.zero_grad()
        adv_loss.backward()
        adv_opt.step()

        c = model.classifier(x)
        c_loss = F.cross_entropy(c, labels)
        clf_opt.zero_grad()
        c_loss.backward()
        clf_opt.step()

    step()  # warmup
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "torch_cpu_vqvae_frames_per_sec",
        "value": round(B * T * n / dt, 1),
        "unit": "frames/sec",
    }))


if __name__ == "__main__":
    main()
