"""Autotuner mechanism (timing runs in Pallas interpreter mode on CPU)."""

from nbody_tpu.utils import autotune


def test_autotune_picks_valid_candidate(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._memory_cache.clear()
    ti, tj = autotune.autotune_tiles(
        256,
        candidates=[(128, 128), (128, 256), (999, 999)],
        loops=1,
        interpret=True,
    )
    assert (ti, tj) in [(128, 128), (128, 256)]
    # disk cache round-trip
    autotune._memory_cache.clear()
    ti2, tj2 = autotune.autotune_tiles(
        256, candidates=[(128, 128)], loops=1, interpret=True
    )
    assert (ti2, tj2) == (ti, tj)


def test_engine_autotune_wiring(tmp_path, monkeypatch):
    # --autotune --interpret must tune and run on CPU (interpret reaches
    # the tuner's candidate timing, not just the final kernel).
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._memory_cache.clear()

    from nbody_tpu.config import SimConfig
    from nbody_tpu.simulation import run

    cfg = SimConfig(n=128, nsteps=50, kernel="pallas", autotune=True,
                    interpret=True)
    result = run(cfg, quiet=True)
    assert len(result.samples) == 1
    # the tuner ran (tiles chosen, valid for the padded size)
    n_padded = 2048  # lcm of default pallas tiles
    assert cfg.tile_i and n_padded % cfg.tile_i == 0
    assert cfg.tile_j and n_padded % cfg.tile_j == 0


def test_autotune_rejects_nondividing(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._memory_cache.clear()
    # none of the candidates divide 200 -> falls back to minimal tiles
    ti, tj = autotune.autotune_tiles(
        200, candidates=[(128, 128)], loops=1, interpret=True
    )
    assert 200 % ti == 0 and 200 % tj == 0
