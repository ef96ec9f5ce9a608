"""Executable public-API parity audit against the reference checkout.

Walks every module of the reference's core package, collects its top-level
public functions/classes by AST (the reference is never imported — its
dependency set differs), and asserts the mapped ark_tpu module exposes each
symbol, modulo the documented re-homes. This turns the round-1 'function-
level audit shows zero missing publics' claim into a standing invariant.

Skipped when no reference checkout is present (end users don't have one).
"""

import ast
import importlib
import os

import pytest

REF_ROOT = "/root/reference/src/ark"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not available")

# reference module (relative to src/ark) -> ark_tpu module
MODULE_MAP = {
    "settings": "ark_tpu.settings",
    "analysis/cell_neighborhood_stats": "ark_tpu.analysis.cell_neighborhood_stats",
    "analysis/dimensionality_reduction": "ark_tpu.analysis.dimensionality_reduction",
    "analysis/neighborhood_analysis": "ark_tpu.analysis.neighborhood_analysis",
    "analysis/spatial_analysis_utils": "ark_tpu.analysis.spatial_analysis_utils",
    "analysis/visualize": "ark_tpu.analysis.visualize",
    "phenotyping/cell_cluster_utils": "ark_tpu.phenotyping.cell_cluster_utils",
    "phenotyping/cell_meta_clustering": "ark_tpu.phenotyping.cell_meta_clustering",
    "phenotyping/cell_som_clustering": "ark_tpu.phenotyping.cell_som_clustering",
    "phenotyping/cluster_helpers": "ark_tpu.phenotyping.cluster_helpers",
    "phenotyping/pixel_cluster_utils": "ark_tpu.phenotyping.pixel_cluster_utils",
    "phenotyping/pixel_meta_clustering": "ark_tpu.phenotyping.pixel_meta_clustering",
    "phenotyping/pixel_som_clustering": "ark_tpu.phenotyping.pixel_som_clustering",
    "phenotyping/pixie_preprocessing": "ark_tpu.phenotyping.pixie_preprocessing",
    "phenotyping/post_cluster_utils": "ark_tpu.phenotyping.post_cluster_utils",
    "phenotyping/weighted_channel_comp": "ark_tpu.phenotyping.weighted_channel_comp",
    "segmentation/ez_seg/composites": "ark_tpu.segmentation.ez_seg.composites",
    "segmentation/ez_seg/ez_object_segmentation":
        "ark_tpu.segmentation.ez_seg.ez_object_segmentation",
    "segmentation/ez_seg/ez_seg_display": "ark_tpu.segmentation.ez_seg.ez_seg_display",
    "segmentation/ez_seg/ez_seg_utils": "ark_tpu.segmentation.ez_seg.ez_seg_utils",
    "segmentation/ez_seg/merge_masks": "ark_tpu.segmentation.ez_seg.merge_masks",
    "segmentation/fiber_segmentation": "ark_tpu.segmentation.fiber_segmentation",
    "segmentation/marker_quantification": "ark_tpu.segmentation.marker_quantification",
    "segmentation/regionprops_extraction": "ark_tpu.segmentation.regionprops_extraction",
    "segmentation/segmentation_utils": "ark_tpu.segmentation.segmentation_utils",
    "segmentation/signal_extraction": "ark_tpu.segmentation.signal_extraction",
    "spLDA/processing": "ark_tpu.spLDA.processing",
    "utils/data_utils": "ark_tpu.utils.data_utils",
    "utils/deepcell_service_utils": "ark_tpu.utils.deepcell_service_utils",
    "utils/example_dataset": "ark_tpu.utils.example_dataset",
    "utils/masking_utils": "ark_tpu.utils.masking_utils",
    "utils/metacluster_remap_gui/colormap_helper":
        "ark_tpu.utils.metacluster_remap_gui.colormap_helper",
    "utils/metacluster_remap_gui/file_reader":
        "ark_tpu.utils.metacluster_remap_gui.file_reader",
    "utils/metacluster_remap_gui/metaclusterdata":
        "ark_tpu.utils.metacluster_remap_gui.metaclusterdata",
    "utils/metacluster_remap_gui/metaclustergui":
        "ark_tpu.utils.metacluster_remap_gui.metaclustergui",
    "utils/metacluster_remap_gui/throttle":
        "ark_tpu.utils.metacluster_remap_gui.throttle",
    "utils/metacluster_remap_gui/zscore_norm":
        "ark_tpu.utils.metacluster_remap_gui.zscore_norm",
    "utils/plot_utils": "ark_tpu.utils.plot_utils",
    "utils/spatial_lda_utils": "ark_tpu.utils.spatial_lda_utils",
}

# deliberate re-homes: reference symbol -> (ark_tpu module, symbol)
REHOMED = {
    ("utils/data_utils", "relabel_segmentation"):
        ("ark_tpu.ops.relabel", "relabel_segmentation"),
}


def _ref_publics(rel):
    path = os.path.join(REF_ROOT, rel + ".py")
    tree = ast.parse(open(path, encoding="utf-8").read())
    names = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if not node.name.startswith("_"):
                names.append(node.name)
    return names


@pytest.mark.parametrize("rel", sorted(MODULE_MAP))
def test_every_reference_public_symbol_has_a_home(rel):
    mod = importlib.import_module(MODULE_MAP[rel])
    missing = []
    for name in _ref_publics(rel):
        if hasattr(mod, name):
            continue
        rehome = REHOMED.get((rel, name))
        if rehome is not None:
            alt = importlib.import_module(rehome[0])
            if hasattr(alt, rehome[1]):
                continue
        missing.append(name)
    assert not missing, (
        f"reference ark/{rel}.py publics missing from {MODULE_MAP[rel]}: "
        f"{missing}")


def test_reference_module_map_is_exhaustive():
    """Every reference source module must appear in MODULE_MAP (so new
    reference modules can't silently fall out of the audit)."""
    refs = []
    for dirpath, _, files in os.walk(REF_ROOT):
        for f in files:
            if f.endswith(".py") and f != "__init__.py":
                full = os.path.join(dirpath, f)
                refs.append(os.path.relpath(full, REF_ROOT)[:-3])
    assert sorted(refs) == sorted(MODULE_MAP)
