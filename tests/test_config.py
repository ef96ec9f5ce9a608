from ark_tpu.config import (CellClusterConfig, LdaConfig, PipelineConfig,
                            PixelClusterConfig, SomConfig)


def test_defaults_match_reference_contract():
    cfg = PipelineConfig()
    assert cfg.pixel.som.seed == 42
    assert cfg.pixel.blur_factor == 2
    assert cfg.pixel.subset_proportion == 0.1
    assert cfg.pixel.channel_percentile_pre_rownorm == 0.99
    assert cfg.pixel.max_k == 20 and cfg.pixel.cap == 3.0
    assert cfg.cell.pixel_cluster_col == "pixel_meta_cluster_rename"
    assert cfg.spatial.distlim == 50
    assert cfg.segmentation.batch_size == 5
    assert cfg.lda.radius == 100


def test_json_roundtrip(tmp_path):
    cfg = PipelineConfig(fovs=["fov0"], base_dir="/data")
    cfg.pixel.channels = ["CD3", "CD45"]
    cfg.pixel.som = SomConfig(xdim=12, seed=7)
    path = tmp_path / "cfg.json"
    cfg.to_json(str(path))
    back = PipelineConfig.from_json(str(path))
    assert back.fovs == ["fov0"]
    assert back.pixel.channels == ["CD3", "CD45"]
    assert back.pixel.som.xdim == 12 and back.pixel.som.seed == 7
    # from string too
    back2 = PipelineConfig.from_json(cfg.to_json())
    assert back2.base_dir == "/data"
