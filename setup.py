"""Setuptools shim: lets `pip install -e . --no-use-pep517` work on
environments whose setuptools predates bundled wheel support (PEP 660
editable builds need the `wheel` package there). All metadata lives in
pyproject.toml."""

from setuptools import setup

setup()
