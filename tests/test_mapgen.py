"""Procedural map generators (utils/mapgen.py) — shape/determinism
checks plus an end-to-end plan on a generated map."""

import numpy as np
import pytest

from svsdf_tpu.utils import mapgen
from svsdf_tpu.utils.gridmap import GridMap


@pytest.mark.parametrize("name", sorted(mapgen.GENERATORS))
def test_generators_produce_reproducible_clouds(name):
    a = mapgen.generate(name, res=0.4, seed=7)
    b = mapgen.generate(name, res=0.4, seed=7)
    assert a.shape[1] == 3 and len(a) > 50
    np.testing.assert_array_equal(a, b)
    c = mapgen.generate(name, res=0.4, seed=8)
    if name not in ("gate", "rooms", "terrain", "road", "broken_road",
                    "spiral"):   # deterministic archetypes ignore seed
        assert len(c) != len(a) or not np.array_equal(a, c)


def test_perlin_noise_range_and_determinism():
    n = mapgen.PerlinNoise(3)
    xs = np.linspace(0, 10, 1000)
    v = n.noise(xs, xs * 0.7, xs * 0.3)
    assert v.min() >= 0.0 and v.max() <= 1.0
    assert v.std() > 0.05         # actually varies
    np.testing.assert_array_equal(v, mapgen.PerlinNoise(3).noise(
        xs, xs * 0.7, xs * 0.3))


def test_broken_road_has_gap():
    full = mapgen.road((0, 5, 0), (40, 5, 0), 4.0, res=0.2)
    broken = mapgen.broken_road((0, 5, 0), (40, 5, 0), 4.0, 15.0, 5.0,
                                res=0.2)
    assert len(broken) < len(full)
    t = broken[:, 0]
    assert not np.any((t > 15.5) & (t < 19.5))   # gap is empty


def test_gridmap_from_generated_map():
    pts = mapgen.generate("gate", res=0.3, seed=0)
    g = GridMap.from_points(pts, 1.0, 1)
    assert g.occ.sum() > 20
    # the gate in the wall at x=25 stays open
    occ2d = g.occ2d
    i = g.grid_index((25.5, 13.0, 0.0))
    assert not occ2d[i[0], i[1]]
