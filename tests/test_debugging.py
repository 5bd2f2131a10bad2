"""NaN-provenance tools (utils.debugging)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufluid.params import SimSettings, TickParams
from tpufluid.state import init_state
from tpufluid.utils.debugging import checked_step, diagnose_resident_step


def _settings():
    # small domain: interpret-mode Pallas cost scales with grid rows and
    # the diagnose test walks all four per-stage audits
    return SimSettings(particle_count=64, particle_spacing=0.1,
                       smoothing_radius=0.2, size=(3.2, 3.2),
                       cell_capacity=8)


def test_checked_step_clean_passes_and_nan_input_flags():
    # one checkify build serves both the clean and the poisoned case
    # (compiling the checked dense step dominates this test's cost)
    s = _settings()
    step = checked_step(s, neighbor_mode="dense")
    err, out = step(init_state(s), TickParams.default())
    err.throw()  # must be a no-op
    assert np.all(np.isfinite(np.asarray(out.position)))

    st = init_state(s)
    bad = st.position.at[0, 0].set(jnp.nan)
    import dataclasses
    st = dataclasses.replace(st, position=bad, predicted=bad)
    err, _ = step(st, TickParams.default())
    with pytest.raises(Exception):
        err.throw()


@pytest.mark.slow  # interpret-mode Pallas; the localizes test below
def test_diagnose_resident_step_clean():  # covers the same code paths
    s = _settings()
    from tpufluid.ops import resident
    gs = resident.init_grid_state(s)
    rep = diagnose_resident_step(gs, TickParams.default(), s)
    assert [k for k in rep] == ["input", "rebin", "density", "forces"]
    assert all(v["finite"] for v in rep.values())
    assert rep["rebin"]["over"] == 0


@pytest.mark.slow  # ~45 s of interpret-mode resident kernel tracing —
def test_diagnose_resident_step_localizes_bad_input():  # a debug tool,
    # not engine coverage; the fast lane keeps every engine's physics
    # parity tests
    s = _settings()
    import dataclasses
    from tpufluid.ops import resident
    gs = resident.init_grid_state(s)
    # poison a LIVE slot (empty slots are masked out of the audit)
    import numpy as np
    live = np.argwhere(np.asarray(resident.valid_mask(gs)))
    y, k, x = map(int, live[len(live) // 2])
    bad = gs.vel_x.at[y, k, x].set(jnp.inf)
    gs = dataclasses.replace(gs, vel_x=bad)
    rep = diagnose_resident_step(gs, TickParams.default(), s)
    assert [k for k in rep] == ["input", "rebin", "density", "forces"]
    assert not rep["input"]["finite"]
