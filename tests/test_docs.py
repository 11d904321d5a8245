"""Static checks on the shipped Sphinx source.

The full ``sphinx-build -W`` runs in CI (the reference's site builds on
readthedocs); these tests pin the failure modes that don't need sphinx
installed: every autodoc target imports, every toctree entry resolves
to a file, and no machine-local paths leak into rendered pages.
"""

import importlib
import re
from pathlib import Path

import pytest

DOCS = Path(__file__).resolve().parent.parent / "docs"
RST_AND_MD = sorted(
    p
    for p in DOCS.rglob("*")
    if p.suffix in (".rst", ".md") and "_build" not in p.parts
)


def _automodule_targets():
    pat = re.compile(r"^\.\.\s+automodule::\s+(\S+)", re.M)
    out = []
    for path in DOCS.rglob("*.rst"):
        out.extend((path, m) for m in pat.findall(path.read_text()))
    return out


def _autoclass_targets():
    pat = re.compile(
        r"^\.\.\s+auto(?:class|function|exception)::\s+(\S+)", re.M
    )
    out = []
    for path in DOCS.rglob("*.rst"):
        out.extend((path, m) for m in pat.findall(path.read_text()))
    return out


def test_automodule_targets_import():
    targets = _automodule_targets()
    assert targets, "no automodule directives found"
    for path, name in targets:
        importlib.import_module(name)


def test_autoclass_targets_resolve():
    for path, name in _autoclass_targets():
        module, _, attr = name.rpartition(".")
        if not module:
            module, attr = "pyopal_tpu", name
        mod = importlib.import_module(module)
        assert hasattr(mod, attr), f"{name} (in {path.name}) missing"


def _toctree_entries(path):
    entries = []
    lines = path.read_text().splitlines()
    in_tree = False
    for line in lines:
        if re.match(r"^\s*\.\.\s+toctree::", line):
            in_tree = True
            continue
        if in_tree:
            if re.match(r"^\s+:\w+:", line) or not line.strip():
                if not line.strip() and entries and entries[-1] is None:
                    in_tree = False
                continue
            if not line.startswith(" "):
                in_tree = False
                continue
            entries.append((path, line.strip()))
    return [e for e in entries if e is not None]


def test_toctree_targets_exist():
    found = []
    for path in DOCS.rglob("*.rst"):
        found.extend(_toctree_entries(path))
    assert found, "no toctree entries found"
    for path, entry in found:
        base = path.parent / entry
        candidates = [
            base.with_suffix(suf) for suf in (".rst", ".md", ".ipynb")
        ]
        assert any(c.exists() for c in candidates), (
            f"dangling toctree entry {entry!r} in {path.name}"
        )


def test_no_machine_local_paths_in_docs():
    for path in RST_AND_MD:
        assert "/root/reference" not in path.read_text(), (
            f"machine-local path leaked into {path}"
        )


def test_requirements_cover_markdown_sources():
    # workflow.md is a MyST page: the parser must be in the doc deps
    reqs = (DOCS / "requirements.txt").read_text()
    assert "myst-parser" in reqs


@pytest.mark.parametrize(
    "name",
    [
        "align",
        "aligner",
        "alphabet",
        "database",
        "matrices",
        "results",
        "io",
        "parallel",
    ],
)
def test_api_index_lists_every_page(name):
    index = (DOCS / "api" / "index.rst").read_text()
    assert re.search(rf"^\s+{name}\s*$", index, re.M)
    assert (DOCS / "api" / f"{name}.rst").exists()


def test_workflow_notebook_executes():
    """Every code cell of the example notebook runs against the
    current API (the in-repo analog of the CI myst-nb execution,
    which re-executes the notebook during the -W docs build)."""
    import json
    import pathlib

    nb_path = (
        pathlib.Path(__file__).resolve().parents[1]
        / "docs"
        / "examples"
        / "workflow.ipynb"
    )
    nb = json.loads(nb_path.read_text())
    ns: dict = {}
    for i, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        try:
            exec(compile(src, f"workflow.ipynb cell {i}", "exec"), ns)
        except Exception as err:  # pragma: no cover - failure detail
            raise AssertionError(
                f"notebook cell {i} failed: {err}\n---\n{src}"
            ) from err
