import subprocess
from pathlib import Path

from setuptools import find_packages, setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    """Build the C++ DSP library alongside the Python package."""

    def run(self):
        native = Path(__file__).parent / "crank_tpu" / "native"
        subprocess.run(["make", "-C", str(native)], check=True)
        super().run()


setup(
    name="crank-tpu",
    version="0.1.0",
    description=(
        "TPU-native non-parallel voice conversion: hierarchical VQ-VAE with "
        "adversarial training (JAX/XLA/Pallas) and a first-party C++ vocoder"
    ),
    packages=find_packages(include=["crank_tpu", "crank_tpu.*"]),
    package_data={"crank_tpu.native": ["src/*", "Makefile"]},
    python_requires=">=3.10",
    install_requires=[
        "jax", "flax", "optax", "numpy", "scipy", "h5py", "pyyaml", "joblib",
    ],
    cmdclass={"build_py": BuildWithNative},
    entry_points={
        "console_scripts": [
            "crank-tpu-run=crank_tpu.bin.run:main",
            "crank-tpu-train=crank_tpu.bin.train:main",
        ]
    },
)
