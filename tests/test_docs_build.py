"""The rendered-docs pipeline must stay green (VERDICT r2 missing #3).

The reference renders a Documenter site with autodoc, a citation database,
and linkcheck on every push (/root/reference/docs/make.jl:42-91); this
build's analogue is docs/build_docs.py.  Strict mode fails on unknown
citation keys, dangling internal links, or API modules that no longer
import — so this test is also an import-surface canary for the package.
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_site_builds_strict(tmp_path):
    out = tmp_path / "site"
    proc = subprocess.run(
        [sys.executable, str(ROOT / "docs" / "build_docs.py"),
         "--strict", "--out", str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    pages = {p.name for p in out.glob("*.html")}
    for required in ("index.html", "api.html", "reference.html",
                     "references.html", "design.html", "parity.html"):
        assert required in pages, f"missing page {required}"

    # autodoc really rendered the API (not an empty shell)
    ref = (out / "reference.html").read_text()
    for symbol in ("newton_krylov", "JacobianOperator", "EisenstatWalker",
                   "stencil_jvp_chain_pallas", "residual_scaled_df"):
        assert symbol in ref, f"autodoc lost {symbol}"

    # citations resolved into the bibliography
    refs = (out / "references.html").read_text()
    for key in ("Kelley2003", "Kelley2022", "Kan2022", "MontoisonOrban2023"):
        assert f'id="{key}"' in refs, f"missing reference entry {key}"
    design = (out / "design.html").read_text()
    assert 'href="references.html#EisenstatWalker1996"' in design

    # linkcheck artifact exists and recorded no problems
    lc = json.loads((out / "linkcheck.json").read_text())
    assert lc["problems"] == []
    assert lc["external_links"], "external-link inventory empty"
