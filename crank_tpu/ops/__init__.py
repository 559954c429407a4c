"""Custom TPU kernels (Pallas).

Currently empty by measurement, not omission: the one candidate hot op
outside the convolutions — the VQ codebook search (scores -> argmin ->
one-hot projections + EMA statistics) — was implemented as a fused Pallas
kernel in rounds 1-2 and benchmarked against the pure-XLA formulation in
models/vq.py at production geometry (N=25k, D=64, K=512, TPU v5e).  XLA's
automatic fusion never materializes the [N, K] score matrix in HBM and ran
~2x faster than the hand kernel (22-25 us vs 44 us/call at the best tile
size, identical argmin output), so the kernel was deleted rather than kept
as a slower option.  The conv stacks themselves are XLA convolutions, which
map straight onto the MXU.
"""
