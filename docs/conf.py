"""Sphinx configuration for gpar-tpu (mirrors the reference's autodoc docs,
reference ``docs/conf.py``)."""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "gpar-tpu"
copyright = "2026, gpar-tpu developers"
author = "gpar-tpu developers"
release = "0.2.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_member_order = "bysource"
napoleon_google_docstring = True

html_theme = "sphinx_rtd_theme"
exclude_patterns = ["_build"]
