"""Example-dataset fetcher (HuggingFace `angelolab/ark_example`; reference
`src/ark/utils/example_dataset.py:12-217`). In zero-egress environments the
download raises at fetch time; a local `ARK_EXAMPLE_DATASET_DIR` mirror is
honored as an offline source."""

from __future__ import annotations

import os
import pathlib
import shutil
import warnings
from typing import Union

from ark_tpu.io.misc_utils import verify_in_list
from ark_tpu.settings import EXAMPLE_DATASET_REVISION

VALID_DATASETS = ["segment_image_data", "cluster_pixels", "cluster_cells",
                  "post_clustering", "fiber_segmentation",
                  "LDA_preprocessing", "LDA_training_inference",
                  "neighborhood_analysis", "pairwise_spatial_enrichment",
                  "ome_tiff", "ez_seg_data"]


class ExampleDataset:
    """Download + relocate one named partition of the example dataset."""

    def __init__(self, dataset: str, overwrite_existing: bool = True,
                 cache_dir: str = None, revision: str = None) -> None:
        self.dataset_paths = None
        self.dataset = dataset
        self.overwrite_existing = overwrite_existing
        self.cache_dir = pathlib.Path(cache_dir) if cache_dir else \
            pathlib.Path("~/.cache/huggingface/datasets").expanduser()
        self.revision = revision
        self.path_suffixes = {
            "image_data": "image_data",
            "cell_table": "segmentation/cell_table",
            "deepcell_output": "segmentation/deepcell_output",
            "example_pixel_output_dir": "pixie/example_pixel_output_dir",
            "example_cell_output_dir": "pixie/example_cell_output_dir",
            "spatial_lda": "spatial_analysis/spatial_lda",
            "post_clustering": "post_clustering",
            "ome_tiff": "ome_tiff",
            "ez_seg_data": "ez_seg_data",
        }

    def download_example_dataset(self):
        """Fetch the dataset partition (HF hub, or the local offline mirror
        pointed to by ARK_EXAMPLE_DATASET_DIR)."""
        local_mirror = os.environ.get("ARK_EXAMPLE_DATASET_DIR")
        if local_mirror:
            base = pathlib.Path(local_mirror) / self.dataset
            self.dataset_paths = {self.dataset: {
                p.name: p for p in base.iterdir() if p.is_dir()}}
            return
        import datasets
        ds_paths = datasets.load_dataset(
            path="angelolab/ark_example", revision=self.revision,
            name=self.dataset, cache_dir=self.cache_dir, token=False,
            trust_remote_code=True)
        self.dataset_paths = {}
        for ds_name, ds in ds_paths.items():
            self.dataset_paths[ds_name] = {}
            for feature in ds.features:
                p, = ds[feature]
                p = pathlib.Path(*pathlib.Path(p).parts[-3:])
                self.dataset_paths[ds_name][feature] = \
                    self.cache_dir / p / feature

    def check_empty_dst(self, dst_path: pathlib.Path) -> bool:
        """True if no files exist under dst_path."""
        return len(list(dst_path.rglob("*"))) == 0

    def move_example_dataset(self, move_dir: Union[str, pathlib.Path]):
        """Copy each downloaded partition into its canonical subdirectory."""
        move_dir = pathlib.Path(move_dir)
        dataset_names = list(self.dataset_paths[self.dataset].keys())
        for ds_n in dataset_names:
            ds_n_suffix = pathlib.Path(self.path_suffixes[ds_n])
            src_path = pathlib.Path(self.dataset_paths[self.dataset][ds_n])
            dst_path = move_dir / ds_n_suffix
            empty_dst_path = self.check_empty_dst(dst_path=dst_path) \
                if dst_path.exists() else True
            if self.overwrite_existing:
                if not empty_dst_path:
                    warnings.warn(UserWarning(
                        f"Files exist in {dst_path}. They will be "
                        f"overwritten by the downloaded example dataset."))
                if dst_path.exists():
                    for f in dst_path.glob("*"):
                        if f.is_file():
                            f.unlink()
                shutil.copytree(src_path, dst_path, dirs_exist_ok=True,
                                ignore=shutil.ignore_patterns(".!*"))
            else:
                if empty_dst_path:
                    warnings.warn(UserWarning(
                        f"Files do not exist in {dst_path}. The example "
                        f"dataset will be added in."))
                    shutil.copytree(src_path, dst_path, dirs_exist_ok=True,
                                    ignore=shutil.ignore_patterns(".!*"))
                else:
                    warnings.warn(UserWarning(
                        f"Files exist in {dst_path}. They will not be "
                        f"overwritten."))


def get_example_dataset(dataset: str, save_dir: Union[str, pathlib.Path],
                        overwrite_existing: bool = True):
    """Download a named example-dataset partition and place it in save_dir."""
    try:
        verify_in_list(dataset=dataset, valid_datasets=VALID_DATASETS)
    except ValueError:
        raise ValueError(
            f'The dataset "{dataset}" is not one of the valid datasets '
            f"available. The following are available: {(*VALID_DATASETS,)}"
        ) from None
    example_dataset = ExampleDataset(
        dataset=dataset, overwrite_existing=overwrite_existing,
        cache_dir=None, revision=EXAMPLE_DATASET_REVISION)
    example_dataset.download_example_dataset()
    example_dataset.move_example_dataset(move_dir=save_dir)
