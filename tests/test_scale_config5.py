"""Config-5 scale stress (BASELINE.json: 100-FOV pod-sharded cohort;
VERDICT r2 next #10). Shapes are tiny so the suite stays fast, but the
STRUCTURE is the stretch config's: 100 FOVs streamed through the 8-device
mesh in batches, mid-cohort crash-resume, and a >50k-cell FOV through the
blocked neighbor kernel with bounded peak memory (measured as the child
process's ru_maxrss — the full distance matrix alone would be ~10 GB).

Marked `scale`; deselect with `-m "not scale"`.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.scale

FOVS_100 = [f"fov{i}" for i in range(100)]


def test_100_fov_cohort_streams_through_mesh_in_batches():
    """100 FOVs through the sharded pixel-cohort program in 10-FOV batches:
    one compiled executable reused per batch (the program takes norms as
    traced args), outputs accumulated per-FOV — never a 100-FOV block."""
    import jax

    from ark_tpu.parallel import cohort, mesh as mesh_utils

    rng = np.random.default_rng(0)
    mesh = mesh_utils.get_mesh()
    assert mesh.devices.size == 8  # conftest's virtual mesh
    c = 4
    weights = rng.random((100, c)).astype(np.float32)
    norms = np.full(c, 0.9, np.float32)
    post = np.full(c, 0.8, np.float32)

    per_fov_clusters = {}
    first_batch_imgs = None
    for start in range(0, 100, 10):
        batch_fovs = FOVS_100[start:start + 10]
        imgs = rng.random((10, 16, 16, c)).astype(np.float32)
        if first_batch_imgs is None:
            first_batch_imgs = imgs
        out = cohort.run_pixel_cohort(imgs, norms, 0.05, post, weights,
                                      mesh=mesh)
        for name, row in zip(batch_fovs, out["som_clusters"]):
            per_fov_clusters[name] = row
    assert len(per_fov_clusters) == 100
    assert all(v.shape == (256,) for v in per_fov_clusters.values())
    # the pipeline must have assigned real clusters, not all-filtered
    assert max(int(v.max()) for v in per_fov_clusters.values()) > 0
    # value oracle (not just shape/positivity): the mesh-sharded batch
    # program must agree with a direct per-FOV evaluation that bypasses
    # the mesh/vmap/pad/shard machinery this test exists to exercise —
    # catches wrong-row/wrong-shard regressions the old max() > 0 missed
    # (formula-level correctness is bound by the phenotyping goldens)
    import jax.numpy as jnp
    for i, name in enumerate(FOVS_100[:10]):
        direct = cohort._pixel_per_fov(
            jnp.asarray(first_batch_imgs[i]), jnp.asarray(norms),
            jnp.float32(0.05), jnp.asarray(post), jnp.asarray(weights),
            blur_factor=2)
        np.testing.assert_array_equal(per_fov_clusters[name],
                                      np.asarray(direct["som_clusters"]))


def test_100_fov_resume_mid_cohort(tmp_path):
    """Kill-and-resume at FOV 40 of 100: the disk-state machinery must
    redo exactly the unprocessed tail and commit losslessly."""
    from ark_tpu.io import feather_utils as feather
    from ark_tpu.phenotyping import (cluster_helpers, pixel_cluster_utils,
                                     pixel_som_clustering)

    rng = np.random.default_rng(1)
    channels = ["c0", "c1", "c2"]
    base = tmp_path
    (base / "pixel_mat_subsetted").mkdir()
    (base / "pixel_mat_data").mkdir()
    originals = {}
    for fov in FOVS_100:
        df = pd.DataFrame(rng.random((20, 3)).astype(np.float32),
                          columns=channels)
        df["fov"] = fov
        df["row_index"] = rng.integers(0, 16, 20)
        df["column_index"] = rng.integers(0, 16, 20)
        df["label"] = rng.integers(1, 5, 20)
        originals[fov] = df.copy()
        feather.write_dataframe(df.sample(10, random_state=1),
                                base / "pixel_mat_subsetted" / f"{fov}.feather")
        feather.write_dataframe(df, base / "pixel_mat_data" / f"{fov}.feather")
    feather.write_dataframe(pd.DataFrame([[0.9] * 3], columns=channels),
                            base / "post_rowsum_chan_norm.feather")

    pysom = pixel_som_clustering.train_pixel_som(FOVS_100, channels,
                                                 str(base))
    # simulate a run killed after 40 FOVs: their labeled output is in temp
    data_path = str(base / "pixel_mat_data")
    pixel_cluster_utils.claim_temp_dir(data_path, "pixel_som_cluster")
    for fov in FOVS_100[:40]:
        df = feather.read_dataframe(base / "pixel_mat_data" / f"{fov}.feather")
        feather.write_dataframe(pysom.assign_som_clusters(df),
                                base / "pixel_mat_data_temp" / f"{fov}.feather")

    missing = pixel_cluster_utils.find_fovs_missing_col(
        str(base), "pixel_mat_data", "pixel_som_cluster")
    assert sorted(missing) == sorted(FOVS_100[40:])
    pixel_som_clustering.cluster_pixels(FOVS_100, str(base), pysom,
                                        data_dir="pixel_mat_data")
    assert not os.path.exists(data_path + "_temp")
    for fov in (FOVS_100[0], FOVS_100[39], FOVS_100[40], FOVS_100[99]):
        df = feather.read_dataframe(base / "pixel_mat_data" / f"{fov}.feather")
        assert "pixel_som_cluster" in df.columns
        assert len(df) == 20
        # losslessness oracle: committed values must equal a direct
        # assignment of the ORIGINAL per-FOV table (the committed channels
        # are already norm-divided, so re-assigning them would double-
        # normalize) — both for the FOVs the "crashed run" had written
        # into temp (0, 39: temp data preserved, not garbage-committed)
        # and for the resumed tail (40, 99)
        want = pysom.assign_som_clusters(originals[fov])
        np.testing.assert_array_equal(df["pixel_som_cluster"].values,
                                      want["pixel_som_cluster"].values)


_BIG_FOV_CHILD = textwrap.dedent("""
    import resource

    # On this kernel a fresh subprocess INHERITS its parent's RSS high-water
    # mark through fork+exec (an empty child spawned from a 4 GB pytest
    # parent reports ru_maxrss=4 GB) — so the bound must be the DELTA this
    # workload adds over the at-start baseline, not the absolute peak.
    base_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    # baseline sanity: a bloated inherited high-water mark silently loosens
    # the delta bound below (delta < 3 with base 8 GB admits the full
    # 10.5 GB dense matrix). The child inherits the PARENT's high-water
    # mark (see note above), so under a big full-suite parent the bound is
    # unmeasurable — report that and let the test skip rather than pass
    # vacuously or fail spuriously; standalone runs enforce the bound.
    if base_gb >= 4.0:
        print(f"SKIP_BASELINE base_gb={base_gb:.2f}")
        raise SystemExit(0)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ark_tpu.ops import distances

    n, p = 51_200, 6
    rng = np.random.default_rng(0)
    coords = rng.random((n, 2)).astype(np.float32) * 5000.0
    pheno = rng.integers(0, p, n)
    onehot = np.eye(p, dtype=np.float32)[pheno]
    counts = distances.blocked_neighbor_counts(coords, onehot,
                                               dist_lim=50.0,
                                               block_rows=2048)
    assert counts.shape == (n, p)
    # oracle on row slices chosen to cross the blocking structure
    # (block_rows=2048, 51200 = 25 exact blocks): rows inside block 0,
    # rows STRADDLING the block-0/1 boundary, and rows deep in a late
    # block — a wrong per-block row offset is exact on block 0 and wrong
    # everywhere after, which a first-64-rows-only oracle never sees.
    # The D=2 kernel computes |a-b|² directly (the a²+b²-2ab decomposition
    # dropped close pairs at this coordinate scale — see
    # pairwise_distances), so only pairs within f32 rounding of the 50.0
    # threshold may differ
    rows = np.r_[0:32, 2040:2056, 49_160:49_176]
    d = np.sqrt(((coords[rows, None, :].astype(np.float64)
                  - coords[None, :, :].astype(np.float64)) ** 2).sum(-1))
    want = ((d < 50.0) & (d > 0)).astype(np.float64) @ onehot.astype(np.float64)
    slack = (np.abs(d - 50.0) < 1e-3).astype(np.float64) @ onehot.astype(np.float64)
    err = np.abs(counts[rows] - want)
    assert (err <= slack + 1e-3).all(), \
        f"max err {err.max()} beyond borderline slack"
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    delta_gb = peak_gb - base_gb
    print(f"peak_rss_gb={peak_gb:.2f} delta_rss_gb={delta_gb:.2f} "
          f"mean_neighbors={counts.sum(1).mean():.2f}")
    # the full 51.2k x 51.2k f32 matrix alone is 10.5 GB; blocked streaming
    # must keep this workload's own footprint (incl. jax runtime) far under
    # that. Delta, not absolute: see the inherited-high-water note above.
    assert delta_gb < 3.0, \
        f"delta RSS {delta_gb:.2f} GB (peak {peak_gb:.2f}) - not streaming"
""")


def test_50k_cell_fov_blocked_neighbors_bounded_memory():
    """>50k-cell FOV neighbor counts in a fresh subprocess so ru_maxrss is
    a clean high-water mark for THIS workload."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # 900 s: the child does ~16 s of work alone, but on this 1-core host a
    # kernel lingering from the executed-notebook suite can time-slice it
    res = subprocess.run([sys.executable, "-c", _BIG_FOV_CHILD], env=env,
                         cwd=repo, capture_output=True, text=True,
                         timeout=900)
    assert res.returncode == 0, \
        f"stdout: {res.stdout[-500:]}\nstderr: {res.stderr[-2000:]}"
    if "SKIP_BASELINE" in res.stdout:
        pytest.skip("inherited RSS baseline >= 4 GB (big suite parent): "
                    "the delta bound is unmeasurable here - "
                    + res.stdout.strip().splitlines()[-1])
    assert "peak_rss_gb=" in res.stdout, res.stdout[-500:]
