"""Convert every walkthrough into an EXECUTED Jupyter notebook.

The reference ships two *interactive* Pluto notebooks
(`/root/reference/docs/src/notebooks/heat_1D_DG.jl`, `heat_2d.jl`,
rendered by PlutoStaticHTML in `/root/reference/docs/make.jl:10-29`).
The walkthrough markdowns already cover that content with executed
figures (docs/run_walkthroughs.py); this script closes the remaining
gap — the artifact a user can OPEN AND RE-RUN interactively — by
splitting each `walkthrough_*.md` into markdown/code cells, executing
the notebook with a real kernel (nbclient), and writing the executed
`.ipynb` (outputs, figures inline) to ``docs/notebooks/``.
`build_docs.py` copies them into the site.

One kernel per notebook, fresh env per run (the sharded walkthrough
needs `XLA_FLAGS` set before JAX backend init — same isolation rule as
run_walkthroughs.py).  The notebooks are *generated artifacts*: edit the
walkthrough markdown, not the .ipynb.

Usage: python docs/build_notebooks.py [name ...]
"""

import glob
import os
import re
import sys

DOCS = os.path.dirname(os.path.abspath(__file__))
# NK_NB_OUT: output-directory override (tests build into a tmp dir so a
# test run never dirties the committed artifacts — cell ids are random)
OUT = os.environ.get("NK_NB_OUT") or os.path.join(DOCS, "notebooks")

# Split the markdown into alternating prose / ```python fenced segments.
FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _notebookify(code: str) -> str:
    """Walkthrough code runs headless (Agg backend, figures closed after
    saving); in notebook form we want the figures DISPLAYED inline, so the
    two headless-only lines are dropped — everything else is verbatim."""
    keep = []
    for line in code.splitlines():
        t = line.strip()
        if t.startswith("matplotlib.use(") or t.startswith("plt.close("):
            continue
        keep.append(line)
    return "\n".join(keep)


def md_to_cells(src: str):
    import nbformat

    cells = []
    pos = 0
    for m in FENCE.finditer(src):
        prose = src[pos:m.start()].strip()
        if prose:
            cells.append(nbformat.v4.new_markdown_cell(prose))
        cells.append(nbformat.v4.new_code_cell(_notebookify(m.group(1).rstrip())))
        pos = m.end()
    tail = src[pos:].strip()
    if tail:
        cells.append(nbformat.v4.new_markdown_cell(tail))
    return cells


def build(path: str) -> str:
    import nbformat
    from nbclient import NotebookClient

    name = os.path.basename(path).replace("walkthrough_", "").replace(".md", "")
    src = open(path).read()
    nb = nbformat.v4.new_notebook()
    # FIGDIR seam: walkthrough figure blocks save through it; in notebook
    # form the figures also render inline via the matplotlib Agg payloads.
    # Relative path, NOT this build machine's absolute one — the committed
    # artifact must re-run on a user's machine.
    preamble = (
        "import os\n"
        "FIGDIR = os.path.join(os.getcwd(), '_figs')\n"
        "os.makedirs(FIGDIR, exist_ok=True)\n"
        "%matplotlib inline\n"
    )
    nb.cells = [nbformat.v4.new_code_cell(preamble)] + md_to_cells(src)
    nb.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python",
    }
    nb.metadata["language_info"] = {"name": "python"}

    os.makedirs(OUT, exist_ok=True)
    # Kernel env: NotebookClient's kernel inherits THIS process's
    # os.environ (there is no per-kernel env seam), so mutate it directly —
    # a separate dict here would be dead code masquerading as isolation
    # (review r5).  The flags are harmless for the non-sharded walkthroughs.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_cpu_enable_fast_math" not in flags:
        flags = (flags + " --xla_cpu_enable_fast_math=false").strip()
    os.environ["XLA_FLAGS"] = flags
    client = NotebookClient(
        nb, timeout=900, kernel_name="python3",
        resources={"metadata": {"path": os.path.dirname(DOCS)}},
    )
    client.execute()
    out_path = os.path.join(OUT, f"{name}.ipynb")
    nbformat.write(nb, out_path)
    n_out = sum(1 for c in nb.cells
                if c.cell_type == "code" and c.get("outputs"))
    print(f"== {name}: {len(nb.cells)} cells, {n_out} with outputs "
          f"-> {os.path.relpath(out_path, os.path.dirname(DOCS))}")
    return out_path


def main():
    names = sys.argv[1:]
    paths = sorted(glob.glob(os.path.join(DOCS, "walkthrough_*.md")))
    if names:
        paths = [p for p in paths if any(n in p for n in names)]
    if not paths:
        raise SystemExit("no walkthroughs matched")
    for p in paths:
        # one subprocess per notebook: kernel isolation mirrors
        # run_walkthroughs.py (XLA device-count flags, namespaces)
        if len(paths) == 1:
            build(p)
        else:
            import subprocess
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 os.path.basename(p)], check=True)
            continue


if __name__ == "__main__":
    main()
