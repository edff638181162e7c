from setuptools import setup, Extension

setup(
    ext_modules=[
        Extension(
            "transit_tpu._native",
            sources=["native/lineprep.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
        ),
    ],
)
