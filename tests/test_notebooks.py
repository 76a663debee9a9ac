"""The shipped notebooks are generated from examples/*.py and must stay in
sync (scripts/make_notebooks.py); their code cells must be valid Python.

Covers the reference's notebook user surface
(/root/reference/notebooks/00_quick_setup_test.ipynb, 02_training.ipynb,
03_evaluation.ipynb) without executing the flows — the example scripts
themselves are the executable form.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
NOTEBOOKS = sorted((REPO / "notebooks").glob("*.ipynb"))


def test_notebooks_exist():
    names = {p.name for p in NOTEBOOKS}
    assert {"00_quick_setup_test.ipynb", "02_training.ipynb",
            "03_evaluation.ipynb"} <= names


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_is_valid(path):
    nb = json.loads(path.read_text())
    assert nb["nbformat"] == 4
    kinds = {c["cell_type"] for c in nb["cells"]}
    assert "code" in kinds and "markdown" in kinds
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        compile(src, path.name, "exec")  # raises SyntaxError if broken
        assert cell["outputs"] == [] and cell["execution_count"] is None


def test_notebooks_match_generator():
    """Regeneration is a no-op — notebooks can't drift from the examples."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_notebooks.py"), "--check"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
