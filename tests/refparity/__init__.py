"""Reference numerical-parity harness (round-3, VERDICT item #1).

Utilities to import the reference implementation at /root/reference with its
missing pip dependencies shimmed, build its torch models, and transfer the
torch weights into the flax crank_tpu models so forwards / losses / EMA
updates can be compared numerically.
"""
