"""Plotting helpers (reference: crank/utils/utils.py:87-91)."""

from pathlib import Path


def plot_mlfb(mlfb, path, ext="png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    plt.figure()
    plt.imshow(mlfb.T, origin="lower", aspect="auto")
    plt.savefig(f"{path}.{ext}")
    plt.close()
