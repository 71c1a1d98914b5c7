from setuptools import find_packages, setup

setup(
    name="qpwcnet_tpu",
    version="0.1.0",
    description=(
        "TPU-native optical-flow framework (PWC-Net family): JAX/XLA/"
        "Pallas cost-volume + warp kernels, frame-interpolation "
        "pretraining, flow-aware augmentation, AGC training, int8 QAT"
    ),
    packages=find_packages(include=["qpwcnet_tpu", "qpwcnet_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "einops",
        "pillow",
    ],
    extras_require={
        "viz": ["matplotlib", "tensorboardX"],
        "test": ["pytest"],
    },
)
