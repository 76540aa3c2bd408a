"""Build the gadget_native C extension:  cd native && python setup.py build_ext --inplace
The Makefile target `make native` at the repo root wraps this."""

from setuptools import Extension, setup

setup(
    name="gadget_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "gadget_native",
            sources=["gadget_native.c"],
            extra_compile_args=["-O3", "-std=c11"],
        )
    ],
)
