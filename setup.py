"""Legacy-path shim so `pip install -e .` works on hermetic images that
ship setuptools without `wheel` (PEP 660 editable installs need
bdist_wheel; `setup.py develop` does not). All metadata lives in
pyproject.toml."""

from setuptools import setup

setup()
