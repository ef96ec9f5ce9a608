"""Notebook-surface validation (the analog of the reference's
`tests/utils/notebook_update_test.py` template-sync test).

The .ipynb forms must (a) cover every reference notebook name, (b) be valid
nbformat-4 JSON whose code cells parse, and (c) only reference library
symbols that actually exist — imports are resolved and attribute calls on
imported modules are getattr-checked, so a renamed function breaks this
test, not a user's kernel.
"""

import ast
import importlib
import json
import os

import pytest

TEMPLATES = os.path.join(os.path.dirname(__file__), "..", "templates")

# the reference's notebook surface (/root/reference/templates/), 17 names
REFERENCE_NOTEBOOKS = [
    "1_Segment_Image_Data.ipynb",
    "2_Pixie_Cluster_Pixels.ipynb",
    "3_Pixie_Cluster_Cells.ipynb",
    "4_Post_Clustering.ipynb",
    "Calculate_Mixing_Scores.ipynb",
    "Generalized_Masking.ipynb",
    "Image_Stitching.ipynb",
    "LDA_Preprocessing.ipynb",
    "LDA_Training_and_Inference.ipynb",
    "OME-TIFF_Conversion.ipynb",
    "anndata_conversion.ipynb",
    "cell_neighbors_analysis.ipynb",
    "example_neighborhood_analysis_script.ipynb",
    "example_visualization.ipynb",
    "ez_segmenter.ipynb",
    "generic_cell_clustering.ipynb",
    "mask_generation.ipynb",
]


def _notebooks():
    return sorted(f for f in os.listdir(TEMPLATES) if f.endswith(".ipynb"))


def test_reference_notebook_surface_complete():
    present = set(_notebooks())
    missing = [n for n in REFERENCE_NOTEBOOKS if n not in present]
    assert not missing, f"missing notebook templates: {missing}"


@pytest.mark.parametrize("name", _notebooks())
def test_notebook_is_valid_and_code_parses(name):
    with open(os.path.join(TEMPLATES, name)) as f:
        nb = json.load(f)
    assert nb["nbformat"] == 4
    assert nb["cells"], name
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert code_cells, name
    for cell in nb["cells"]:
        assert cell["cell_type"] in ("code", "markdown")
        src = "".join(cell["source"])
        if cell["cell_type"] == "code":
            ast.parse(src)          # must be syntactically valid python


@pytest.mark.parametrize("name", _notebooks())
def test_notebook_library_references_resolve(name):
    """Every `from ark_tpu... import X` resolves, and every attribute used
    on an imported ark_tpu module exists."""
    with open(os.path.join(TEMPLATES, name)) as f:
        nb = json.load(f)
    src = "\n".join("".join(c["source"]) for c in nb["cells"]
                    if c["cell_type"] == "code")
    tree = ast.parse(src)

    alias_to_module = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module \
                and node.module.startswith("ark_tpu"):
            mod = importlib.import_module(node.module)
            for alias in node.names:
                try:  # submodules need an import, not getattr
                    obj = importlib.import_module(
                        f"{node.module}.{alias.name}")
                except ImportError:
                    obj = getattr(mod, alias.name, None)
                assert obj is not None, \
                    f"{name}: {node.module}.{alias.name} does not exist"
                import types
                if isinstance(obj, types.ModuleType):
                    alias_to_module[alias.asname or alias.name] = obj
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith("ark_tpu"):
                    alias_to_module[alias.asname or alias.name] = \
                        importlib.import_module(alias.name)

    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute) and \
                isinstance(node.value, ast.Name) and \
                node.value.id in alias_to_module:
            mod = alias_to_module[node.value.id]
            assert hasattr(mod, node.attr), \
                f"{name}: {mod.__name__}.{node.attr} does not exist"


def test_update_notebooks_script_covers_all(tmp_path):
    """update_notebooks.sh copies every template notebook without
    clobbering user edits (reference update_notebooks.sh semantics)."""
    import subprocess
    env = dict(os.environ, NOTEBOOK_DIR=str(tmp_path))
    root = os.path.join(os.path.dirname(__file__), "..")
    out = subprocess.run(["bash", os.path.join(root, "update_notebooks.sh")],
                         env=env, capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    copied = sorted(f for f in os.listdir(tmp_path) if f.endswith(".ipynb"))
    assert copied == _notebooks()
    # editing then re-running without -u keeps the edit
    target = os.path.join(tmp_path, copied[0])
    with open(target, "a") as f:
        f.write("\n")
    mtime = os.path.getmtime(target)
    size = os.path.getsize(target)
    subprocess.run(["bash", os.path.join(root, "update_notebooks.sh")],
                   env=env, capture_output=True, text=True)
    assert os.path.getsize(target) == size
    # -u forces the refresh
    subprocess.run(["bash", os.path.join(root, "update_notebooks.sh"), "-u"],
                   env=env, capture_output=True, text=True)
    assert os.path.getsize(target) != size
