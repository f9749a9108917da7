# Sphinx configuration for lynx-tpu documentation.
# Build: pip install sphinx furo && sphinx-build -b html docs docs/_build

project = "lynx-tpu"
author = "lynx-tpu developers"
copyright = "2026, lynx-tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
    "myst_parser",
]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}

autodoc_member_order = "bysource"
html_theme = "furo"
exclude_patterns = ["_build", "examples"]
