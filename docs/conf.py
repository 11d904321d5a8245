# Sphinx configuration for the pyopal_tpu documentation site.
#
# The reference project ships a Sphinx/PyData site built on
# readthedocs (`/root/reference/docs/conf.py`); this is the
# equivalent source for this framework. Build locally with
# `sphinx-build -M html docs docs/_build` (sphinx is not a runtime
# dependency and is intentionally absent from the package deps).

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "pyopal_tpu"
author = "pyopal_tpu contributors"
copyright = "2026, pyopal_tpu contributors"

try:
    import pyopal_tpu

    release = pyopal_tpu.__version__
except Exception:  # pragma: no cover - docs build without the package
    release = "0.0.0"
version = ".".join(release.split(".")[:2])

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.intersphinx",
    "sphinx.ext.doctest",
    "sphinx.ext.viewcode",
]

# The example workflow ships as markdown (docs/examples/workflow.md)
# and as an executed notebook (workflow.ipynb).  With myst-nb
# available (CI + readthedocs, via docs/requirements.txt) the
# notebook is re-EXECUTED during the -W build and any error fails the
# build, so the committed outputs cannot drift from the code; with
# only myst-parser, the markdown page renders; with neither, both are
# excluded so the build still succeeds.
_HAVE_MYST = _HAVE_NB = False
try:
    import myst_nb  # noqa: F401

    extensions.append("myst_nb")
    _HAVE_MYST = _HAVE_NB = True
    nb_execution_mode = "force"
    nb_execution_raise_on_error = True
    nb_execution_timeout = 600
except ImportError:
    try:
        import myst_parser  # noqa: F401

        extensions.append("myst_parser")
        _HAVE_MYST = True
    except ImportError:
        pass

autodoc_member_order = "groupwise"
autodoc_typehints = "description"
autosummary_generate = True

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable", None),
    "jax": ("https://docs.jax.dev/en/latest", None),
}

templates_path = ["_templates"]
exclude_patterns = ["_build", "Thumbs.db", ".DS_Store"]
if not _HAVE_MYST:
    exclude_patterns.append("examples/*.md")
if not _HAVE_NB:
    exclude_patterns.append("examples/*.ipynb")
else:
    # the .md twin of the executed notebook would render as a
    # duplicate page
    exclude_patterns.append("examples/workflow.md")

# Prefer the PyData theme (as the reference site uses) when it is
# installed; fall back to a builtin theme so the docs always build.
try:
    import pydata_sphinx_theme  # noqa: F401

    html_theme = "pydata_sphinx_theme"
except ImportError:
    html_theme = "alabaster"

html_title = f"pyopal_tpu {release}"
html_static_path = []
