"""Pipeline template: cell table → per-FOV AnnData stores (equivalent of
`templates/anndata_conversion.ipynb`; stores are h5ad-layout HDF5)."""

import argparse
import os

from ark_tpu.utils import data_utils


def main(base_dir, cell_table_path, markers="auto"):
    conv = data_utils.ConvertToAnnData(cell_table_path, markers=markers)
    result = conv.convert_to_adata(os.path.join(base_dir, "adata"))
    print(f"wrote {len(result)} AnnData stores")
    adatas = data_utils.load_anndatas(os.path.join(base_dir, "adata"))
    print({k: v.n_obs for k, v in adatas.items()})


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--cell_table_path", required=True)
    a = p.parse_args()
    main(a.base_dir, a.cell_table_path)
