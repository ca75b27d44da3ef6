"""Driver-facing entry points: __graft_entry__ and bench harness wiring."""
import pytest
import numpy as np
import jax


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 7)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_graft_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts finite losses internally


def test_bench_workload_small():
    import bench

    cfg, pd = bench.build_workload(n_node=1500, n_feat=32, n_hidden=32,
                                   n_class=5, n_edge=6000)
    assert pd.graph.n_edge > 0
    step, params, opt_state, const = bench.make_framework_step(cfg, pd)
    import jax.numpy as jnp

    p2, o2, loss = jax.jit(step)(params, opt_state,
                                 jax.random.PRNGKey(0), const)
    assert np.isfinite(float(loss))

    nstep, np_, no_, nc = bench.make_naive_step(cfg, pd)
    _, _, nloss = jax.jit(nstep)(np_, no_, jax.random.PRNGKey(0), nc)
    assert np.isfinite(float(nloss))
