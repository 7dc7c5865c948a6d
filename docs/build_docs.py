"""Render the documentation site — the Documenter.jl analogue for this build.

The reference builds a full HTML site on every push: Literate-rendered
examples, API docs from docstrings, a citation database, ``doctest = true``
and ``linkcheck = true`` (/root/reference/docs/make.jl:42-91,
docs/src/refs.bib).  This build's split of the same obligations:

* **executed examples / doctests** — ``docs/run_walkthroughs.py`` and the CI
  examples job run every example and walkthrough (the verification half);
* **rendered site + API autodoc + citations + linkcheck** — THIS script
  (the render half).  No sphinx/mkdocs in the image, so the renderer is
  self-contained on the stdlib + ``markdown`` + ``pygments``.

Usage::

    python docs/build_docs.py [--out docs/_site] [--strict]

``--strict`` (CI) exits nonzero on any unknown citation key, unresolvable
internal link, or module that fails to import for autodoc.  External http(s)
links are syntax-checked and inventoried into ``linkcheck.json`` (the
runner has no egress; a network linkcheck can consume that inventory).
"""

from __future__ import annotations

import argparse
import html
import importlib
import inspect
import json
import re
import sys
from pathlib import Path

import markdown

DOCS = Path(__file__).resolve().parent
ROOT = DOCS.parent
sys.path.insert(0, str(ROOT))  # import the package from the repo root

PAGES = [
    # (source, output stem, nav title)
    (ROOT / "README.md", "index", "Home"),
    (DOCS / "api.md", "api", "API map"),
    ("__autodoc__", "reference", "API reference"),
    (DOCS / "design.md", "design", "Design notes"),
    (DOCS / "preconditioners.md", "preconditioners", "Choosing a preconditioner"),
    (DOCS / "parity.md", "parity", "Reference parity"),
    (DOCS / "walkthrough_heat2d.md", "walkthrough_heat2d", "Heat 2-D walkthrough"),
    (DOCS / "walkthrough_heat1d_dg.md", "walkthrough_heat1d_dg", "Heat 1-D DG walkthrough"),
    (DOCS / "walkthrough_sharded.md", "walkthrough_sharded", "Sharded-solve walkthrough"),
    (DOCS / "walkthrough_precision.md", "walkthrough_precision",
     "Precision walkthrough (df32 + the floor)"),
    (DOCS / "walkthrough_diagnostics.md", "walkthrough_diagnostics",
     "Diagnostics & globalization walkthrough"),
    ("__bibliography__", "references", "References"),
]

AUTODOC_MODULES = [
    "newtonkrylov_tpu",
    "newtonkrylov_tpu.operator",
    "newtonkrylov_tpu.newton",
    "newtonkrylov_tpu.continuation",
    "newtonkrylov_tpu.forcing",
    "newtonkrylov_tpu.solvers",
    "newtonkrylov_tpu.solvers.gmres",
    "newtonkrylov_tpu.solvers.cg",
    "newtonkrylov_tpu.solvers.bicgstab",
    "newtonkrylov_tpu.solvers.common",
    "newtonkrylov_tpu.precond",
    "newtonkrylov_tpu.mg",
    "newtonkrylov_tpu.fftprec",
    "newtonkrylov_tpu.df32",
    "newtonkrylov_tpu.spectral",
    "newtonkrylov_tpu.timestep",
    "newtonkrylov_tpu.spaces",
    "newtonkrylov_tpu.halo",
    "newtonkrylov_tpu.ops.stencil",
    "newtonkrylov_tpu.ops.sbp",
    "newtonkrylov_tpu.kernels.stencil2d",
    "newtonkrylov_tpu.problems.simple",
    "newtonkrylov_tpu.problems.bratu1d",
    "newtonkrylov_tpu.problems.bratu2d",
    "newtonkrylov_tpu.problems.bvp",
    "newtonkrylov_tpu.problems.heat1d",
    "newtonkrylov_tpu.problems.heat1d_dg",
    "newtonkrylov_tpu.problems.heat2d",
    "newtonkrylov_tpu.problems.spring",
    "newtonkrylov_tpu.problems.convdiff2d",
    "newtonkrylov_tpu.utils.profiling",
    "newtonkrylov_tpu.utils.checkpointing",
    "newtonkrylov_tpu.utils.distributed",
]

STYLE = """
body { font-family: -apple-system, "Segoe UI", Roboto, Helvetica, sans-serif;
       margin: 0; color: #1a1a1a; line-height: 1.55; }
.layout { display: flex; min-height: 100vh; }
nav { width: 230px; flex-shrink: 0; background: #f6f8fa;
      border-right: 1px solid #d8dee4; padding: 1.2rem 0.9rem; }
nav h1 { font-size: 1.02rem; margin: 0 0 0.8rem; }
nav a { display: block; color: #0550ae; text-decoration: none;
        padding: 0.18rem 0.4rem; border-radius: 5px; font-size: 0.92rem; }
nav a.current, nav a:hover { background: #e3ecf7; }
main { max-width: 58rem; padding: 1.6rem 2.4rem 4rem; min-width: 0; }
main h1, main h2, main h3 { line-height: 1.25; }
main h2 { border-bottom: 1px solid #e3e8ee; padding-bottom: 0.25rem; }
code, pre { font-family: ui-monospace, SFMono-Regular, Menlo, monospace;
            font-size: 0.9em; }
pre { background: #f6f8fa; padding: 0.8rem 1rem; overflow-x: auto;
      border-radius: 7px; border: 1px solid #e3e8ee; }
code { background: #f0f2f5; padding: 0.08em 0.3em; border-radius: 4px; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 0.8rem 0; display: block;
        overflow-x: auto; }
th, td { border: 1px solid #d8dee4; padding: 0.3rem 0.65rem;
         font-size: 0.92rem; }
th { background: #f6f8fa; }
.docitem { border: 1px solid #e3e8ee; border-radius: 8px;
           margin: 0.9rem 0; }
.docitem > .sig { background: #f6f8fa; padding: 0.45rem 0.8rem;
                  border-radius: 8px 8px 0 0; font-family: ui-monospace,
                  SFMono-Regular, Menlo, monospace; font-size: 0.88rem;
                  overflow-x: auto; white-space: pre-wrap; }
.docitem > .doc { padding: 0.15rem 0.9rem; }
.refentry { margin: 0.7rem 0; }
.refkey { color: #57606a; font-size: 0.85rem; }
blockquote { border-left: 3px solid #d8dee4; margin-left: 0;
             padding-left: 1rem; color: #57606a; }
"""

CITE_RE = re.compile(r"\[@([A-Za-z][\w:-]*)\]")


def parse_bib(path: Path) -> dict[str, dict[str, str]]:
    """Minimal BibTeX parser: enough for our own refs.bib (field = {...},)."""
    entries: dict[str, dict[str, str]] = {}
    text = path.read_text()
    for m in re.finditer(r"@(\w+)\s*\{\s*([^,\s]+)\s*,(.*?)\n\}", text, re.S):
        kind, key, body = m.group(1).lower(), m.group(2), m.group(3)
        fields = {"__kind__": kind}
        for fm in re.finditer(r"(\w+)\s*=\s*\{((?:[^{}]|\{[^{}]*\})*)\}", body):
            fields[fm.group(1).lower()] = re.sub(
                r"\s+", " ", fm.group(2).replace("{", "").replace("}", "")
            ).replace("--", "–").strip()
        entries[key] = fields
    return entries


def format_ref(key: str, e: dict[str, str]) -> str:
    authors = e.get("author", "?").replace(" and ", "; ")
    title = e.get("title", "?")
    venue = e.get("journal") or e.get("booktitle") or e.get("publisher", "")
    bits = [f"<strong>{html.escape(authors)}</strong>",
            html.escape(title) + "."]
    if venue:
        tail = html.escape(venue)
        if e.get("volume"):
            tail += f" {html.escape(e['volume'])}"
            if e.get("number"):
                tail += f"({html.escape(e['number'])})"
        if e.get("pages"):
            tail += f":{html.escape(e['pages'])}"
        bits.append(f"<em>{tail}</em>,")
    if e.get("year"):
        bits.append(html.escape(e["year"]) + ".")
    if e.get("doi"):
        doi = html.escape(e["doi"])
        bits.append(f'<a href="https://doi.org/{doi}">doi:{doi}</a>')
    return (f'<div class="refentry" id="{key}">{" ".join(bits)} '
            f'<span class="refkey">[{key}]</span></div>')


def autodoc_markdown() -> str:
    """Documenter-autodoc analogue: public API of every module, from the
    live docstrings (so the rendered reference can never drift from code)."""
    out = ["# API reference", "",
           "Generated from the package docstrings by `docs/build_docs.py` "
           "(the `Documenter.makedocs(modules=[Ariadne])` analogue — "
           "reference `docs/make.jl:65-89`).", ""]
    failures = []
    for name in AUTODOC_MODULES:
        try:
            mod = importlib.import_module(name)
        except Exception as exc:  # noqa: BLE001 — report, then strict-fail
            failures.append(f"{name}: {exc}")
            continue
        out.append(f"## `{name}`\n")
        mdoc = inspect.getdoc(mod)
        if mdoc:
            out.append(mdoc.split("\n\n")[0] + "\n")
        public = getattr(mod, "__all__", None)
        if public is None:
            public = [n for n in vars(mod) if not n.startswith("_")]
        for attr in public:
            obj = getattr(mod, attr, None)
            if obj is None or inspect.ismodule(obj):
                continue
            # only document where it's defined (no re-export duplicates)
            if getattr(obj, "__module__", name) != name and name != "newtonkrylov_tpu":
                continue
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = ""
            doc = inspect.getdoc(obj) or ""
            first = doc.split("\n\n")[0] if doc else "(undocumented)"
            out.append(f'<div class="docitem" markdown="1">')
            out.append(f'<div class="sig">{html.escape(attr + sig)}</div>')
            out.append(f'<div class="doc" markdown="1">\n\n{first}\n\n</div>')
            out.append("</div>\n")
    if failures:
        raise RuntimeError("autodoc import failures: " + "; ".join(failures))
    return "\n".join(out)


def bibliography_markdown(bib: dict) -> str:
    out = ["# References", "",
           "Citation database (`docs/refs.bib`) — the reference carries the "
           "first four (`docs/src/refs.bib` upstream); the rest are the "
           "works this build's TPU-specific machinery rests on.", ""]
    for key, e in bib.items():
        out.append(format_ref(key, e))
        out.append("")
    return "\n".join(out)


def build(out_dir: Path, strict: bool) -> int:
    out_dir.mkdir(parents=True, exist_ok=True)
    bib = parse_bib(DOCS / "refs.bib")
    problems: list[str] = []
    ext_links: set[str] = set()
    rendered: dict[str, str] = {}

    md = markdown.Markdown(
        extensions=["tables", "fenced_code", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False,
                                          "noclasses": True}},
    )

    nav_items = [(stem, title) for _, stem, title in PAGES]

    for src, stem, title in PAGES:
        if src == "__autodoc__":
            text = autodoc_markdown()
        elif src == "__bibliography__":
            text = bibliography_markdown(bib)
        elif Path(src).exists():
            text = Path(src).read_text()
        else:
            problems.append(f"missing page source: {src}")
            continue

        # resolve [@key] citations against the bib
        def cite(m: re.Match) -> str:
            key = m.group(1)
            if key not in bib:
                problems.append(f"{stem}: unknown citation key [@{key}]")
                return m.group(0)
            e = bib[key]
            label = e.get("author", key).split(",")[0].split(" and ")[0]
            return f'<a href="references.html#{key}">[{html.escape(label)} {e.get("year", "")}]</a>'

        text = CITE_RE.sub(cite, text)
        md.reset()
        body = md.convert(text)
        rendered[stem] = body
        nav = "\n".join(
            f'<a href="{s}.html"{" class=current" if s == stem else ""}>{html.escape(t)}</a>'
            for s, t in nav_items
        )
        page = f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{html.escape(title)} · newtonkrylov_tpu</title>
<style>{STYLE}</style></head>
<body><div class="layout">
<nav><h1>newtonkrylov_tpu</h1>{nav}</nav>
<main>{body}</main>
</div></body></html>"""
        (out_dir / f"{stem}.html").write_text(page)

    # executed walkthrough figures (docs/_figures, produced by
    # run_walkthroughs.py — the notebook-with-plots analogue,
    # /root/reference/docs/make.jl:10-29) ship with the site
    figdir = DOCS / "_figures"
    if figdir.is_dir():
        import shutil

        out_figs = out_dir / "_figures"
        out_figs.mkdir(exist_ok=True)
        for f in sorted(figdir.glob("*.png")):
            shutil.copy2(f, out_figs / f.name)

    # executed .ipynb notebooks (docs/notebooks, produced by
    # build_notebooks.py — the interactive-Pluto analogue the reference
    # renders at /root/reference/docs/make.jl:10-29): shipped verbatim so
    # a user can download and re-run them
    nbdir = DOCS / "notebooks"
    if nbdir.is_dir():
        import shutil

        out_nb = out_dir / "notebooks"
        out_nb.mkdir(exist_ok=True)
        for f in sorted(nbdir.glob("*.ipynb")):
            shutil.copy2(f, out_nb / f.name)

    # linkcheck: internal targets must exist; externals inventoried
    stems = set(rendered)
    for stem, body in rendered.items():
        for src_ in re.findall(r'<img[^>]*\ssrc="([^"]+)"', body):
            if src_.startswith(("http://", "https://")):
                ext_links.add(src_)
            elif not (out_dir / src_).exists():
                problems.append(f"{stem}: missing image {src_}")
        for href in re.findall(r'href="([^"]+)"', body):
            if href.startswith(("http://", "https://")):
                ext_links.add(href)
            elif href.startswith("#"):
                anchor = href[1:]
                if f'id="{anchor}"' not in body:
                    problems.append(f"{stem}: dangling anchor {href}")
            else:
                target = href.split("#")[0]
                if target.endswith(".html"):
                    if target[:-5] not in stems:
                        problems.append(f"{stem}: dangling internal link {href}")
                elif target and not (ROOT / target).exists() and not (DOCS / target).exists():
                    problems.append(f"{stem}: dangling file link {href}")

    (out_dir / "linkcheck.json").write_text(json.dumps(
        {"external_links": sorted(ext_links),
         "checked": "syntax+inventory (no egress in build env)",
         "problems": problems}, indent=2))

    print(f"rendered {len(rendered)} pages -> {out_dir}")
    print(f"citations: {len(bib)} entries; external links inventoried: {len(ext_links)}")
    if problems:
        print("PROBLEMS:", *problems, sep="\n  ")
        return 1 if strict else 0
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(DOCS / "_site"))
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()
    sys.exit(build(Path(args.out), args.strict))
