"""The executed-notebook pipeline (docs/build_notebooks.py).

The reference renders two interactive Pluto notebooks into its docs
(/root/reference/docs/make.jl:10-29); the analogue here converts each
walkthrough markdown into an executed, re-runnable .ipynb.  CI builds all
four in the docs job; this test pins the conversion + execution machinery
on one walkthrough so the pipeline can't rot between docs builds.
"""

import os
import subprocess
import sys

import pytest

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def test_build_one_executed_notebook(tmp_path):
    # the notebook toolchain is a docs-job dependency, not a test-job one
    # (ci.yml installs nbformat/nbclient/ipykernel only there) — skip
    # rather than error where it is absent
    nbformat = pytest.importorskip("nbformat")
    pytest.importorskip("nbclient")
    pytest.importorskip("ipykernel")

    env = dict(os.environ)
    # build into a tmp dir: cell ids are random per build, so writing the
    # committed artifact would dirty the tree on every test run
    env["NK_NB_OUT"] = str(tmp_path)
    r = subprocess.run(
        [sys.executable, os.path.join(DOCS, "build_notebooks.py"),
         "diagnostics"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    out = os.path.join(str(tmp_path), "diagnostics.ipynb")
    assert os.path.exists(out)
    nb = nbformat.read(out, as_version=4)
    code_cells = [c for c in nb.cells if c.cell_type == "code"]
    md_cells = [c for c in nb.cells if c.cell_type == "markdown"]
    assert len(code_cells) >= 3 and len(md_cells) >= 2
    # executed: every code cell carries an execution_count
    assert all(c.get("execution_count") is not None for c in code_cells)
    # at least one cell produced visible output (the diagnostics prints)
    assert any(c.get("outputs") for c in code_cells)
