"""Execute every ```python block in docs/walkthrough_*.md top-to-bottom.

The Literate.jl/doctest analogue (the reference renders & runs all examples
and notebooks on every docs build, /root/reference/docs/make.jl:42-59,90):
each walkthrough's code blocks share one namespace and must run — and their
embedded assertions must hold — for CI to pass.

Usage: python docs/run_walkthroughs.py [name ...]
"""

import glob
import os
import re
import sys

DOCS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(DOCS))

BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def run(path: str) -> None:
    src = open(path).read()
    blocks = BLOCK.findall(src)
    figdir = os.path.join(DOCS, "_figures")
    os.makedirs(figdir, exist_ok=True)
    # FIGDIR: where a walkthrough's final figure block saves its PNG —
    # committed into docs/_figures and copied into the site by
    # build_docs.py (the executed-notebook-with-plots analogue,
    # /root/reference/docs/make.jl:10-29).
    ns = {"__name__": f"walkthrough:{os.path.basename(path)}",
          "FIGDIR": figdir}
    print(f"== {os.path.basename(path)} ({len(blocks)} blocks)")
    for i, block in enumerate(blocks):
        code = compile(block, f"{path}[block {i}]", "exec")
        exec(code, ns)
    print(f"   OK")


def main():
    names = sys.argv[1:]
    paths = sorted(glob.glob(os.path.join(DOCS, "walkthrough_*.md")))
    if names:
        paths = [p for p in paths if any(n in p for n in names)]
    if not paths:
        raise SystemExit("no walkthroughs matched")
    if len(paths) == 1:
        run(paths[0])
        return
    # One subprocess per walkthrough: a walkthrough's first block may need
    # env that must precede JAX backend init (e.g. the sharded one forces
    # 8 virtual devices via XLA_FLAGS), which a shared process would have
    # consumed already; namespaces stay isolated too.
    import subprocess
    for p in paths:
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        os.path.basename(p)], check=True)


if __name__ == "__main__":
    main()
