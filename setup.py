import os
import subprocess

from setuptools import setup, find_packages
from setuptools.command.build_py import build_py
from setuptools.command.develop import develop


def _build_native():
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.check_call(["make", "-C", os.path.join(here, "native")])


class BuildWithNative(build_py):
    def run(self):
        _build_native()
        super().run()


class DevelopWithNative(develop):
    def run(self):
        _build_native()
        super().run()


setup(
    name="sat_bundleadjust_tpu",
    version="0.1.0",
    description=(
        "TPU-native bundle adjustment for RPC model refinement of satellite "
        "imagery (JAX/XLA/Pallas re-design of sat-bundleadjust)"
    ),
    packages=find_packages(include=["sat_bundleadjust_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "scipy", "networkx", "matplotlib"],
    entry_points={
        "console_scripts": [
            "bundle_adjust=sat_bundleadjust_tpu.cli:main",
        ]
    },
    cmdclass={"build_py": BuildWithNative, "develop": DevelopWithNative},
)
