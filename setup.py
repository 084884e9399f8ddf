from setuptools import setup, find_packages

with open("README.md", "r", encoding="utf-8") as fh:
    long_description = fh.read()

setup(
    name="fovvideovdp_tpu",
    version="0.1.0",
    description="TPU-native (JAX/XLA/Pallas) FovVideoVDP: full-reference "
                "foveated video/image quality metric",
    long_description=long_description,
    long_description_content_type="text/markdown",
    packages=find_packages(include=["fovvideovdp_tpu", "fovvideovdp_tpu.*"]),
    package_data={
        "fovvideovdp_tpu": ["data/*.json", "data/*.npz",
                            "data/xla_seed_cache/*"],
    },
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "numpy",
        "scipy",
    ],
    extras_require={
        "media": ["opencv-python", "Pillow"],
        "test": ["pytest"],
    },
    entry_points={
        "console_scripts": ["fvvdp=fovvideovdp_tpu.run_fvvdp:main"],
    },
)
