"""Flow-warp fast alignment (the opt-in TPU alternative to DCN
alignment): ops.deform_sample numerics vs the grid-sample oracle, and
the MRAPARestorationNet ``alignment='flow'`` variant end-to-end.

FlowAgg has no reference counterpart (it replaces the mmcv DCN the
reference uses at ref_mrapa_restoration_arch.py:74 with one grouped
bilinear warp + dense conv — 9x fewer gather rows), so the oracle here
is this repo's own torch-parity-tested bilinear sampler, not a torch
net.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrefsr_tpu.archs import build_network
from mrefsr_tpu.ops import deform_sample
from mrefsr_tpu.ops.warp import _bilinear_sample


def _oracle(x, flow):
    n, h, w, c = x.shape
    dg = flow.shape[3]
    cg = c // dg
    oy = jnp.arange(h, dtype=flow.dtype)
    ox = jnp.arange(w, dtype=flow.dtype)
    outs = []
    for g in range(dg):
        fy = oy[None, :, None] + flow[..., g, 0]
        fx = ox[None, None, :] + flow[..., g, 1]
        outs.append(_bilinear_sample(x[..., g * cg:(g + 1) * cg], fy, fx,
                                     'zeros'))
    return jnp.concatenate(outs, axis=-1)


def test_deform_sample_matches_grid_sample_oracle():
    rng = np.random.RandomState(0)
    n, h, w, dg, cg = 2, 7, 9, 4, 3
    x = jnp.asarray(rng.randn(n, h, w, dg * cg), jnp.float32)
    # flows spanning in-range, fractional, and out-of-bounds samples
    flow = jnp.asarray(rng.uniform(-3.5, 3.5, (n, h, w, dg, 2)),
                       jnp.float32)
    out = deform_sample(x, flow)
    np.testing.assert_allclose(out, _oracle(x, flow), rtol=1e-5,
                               atol=1e-5)


def test_deform_sample_zero_flow_is_identity():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 5, 6, 8), jnp.float32)
    out = deform_sample(x, jnp.zeros((1, 5, 6, 2, 2), jnp.float32))
    np.testing.assert_allclose(out, x, rtol=1e-6, atol=1e-6)


def test_deform_sample_grads_flow_to_both_inputs():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 6, 4), jnp.float32)
    flow = jnp.asarray(rng.uniform(-1, 1, (1, 6, 6, 2, 2)), jnp.float32)

    def loss(x, flow):
        return jnp.sum(deform_sample(x, flow) ** 2)

    gx, gf = jax.grad(loss, argnums=(0, 1))(x, flow)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gx).sum()) > 0
    assert float(jnp.abs(gf).sum()) > 0


def _flow_net_inputs(rng, b=1, t=2, h=4, w=6):
    x = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    pre_offset, ref_feat = {}, {}
    for level, s, c in (('relu3_1', 1, 256), ('relu2_1', 2, 128),
                        ('relu1_1', 4, 64)):
        pre_offset[level] = jnp.asarray(
            rng.uniform(-2, 2, (b, t, h * s, w * s, 9, 2)), jnp.float32)
        ref_feat[level] = jnp.asarray(
            rng.randn(b, t, h * s, w * s, c), jnp.float32)
    return x, pre_offset, ref_feat


@pytest.mark.slow  # ~55s full-net fwd+grad; FlowAgg also covered by
# the fast deform_sample tests + the dcn_to_flow exactness test
def test_mrapa_flow_alignment_forward_and_grad():
    net = build_network({'type': 'MRAPARestorationNet', 'ngf': 8,
                         'n_blocks': 1, 'groups': 4, 'alignment': 'flow'})
    rng = np.random.RandomState(3)
    x, pre_offset, ref_feat = _flow_net_inputs(rng)
    params = net.init(jax.random.PRNGKey(0), x, pre_offset, ref_feat)

    flat = jax.tree_util.tree_leaves_with_path(params)
    names = '|'.join(jax.tree_util.keystr(p) for p, _ in flat)
    assert 'flow_agg' in names and 'dyn_agg_restore' in names
    assert '_dyn_agg' not in names.replace('dyn_agg_restore', '')

    out = jax.jit(net.apply)(params, x, pre_offset, ref_feat)
    assert out.shape == (1, 16, 24, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(net.apply(p, x, pre_offset, ref_feat) ** 2)

    grads = jax.grad(loss)(params)
    gsum = sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


def test_mrapa_flow_alignment_starts_at_pre_offset():
    """Zero-init head: at init the warp samples exactly at the
    center-tap pre_offset (FlowAgg's re_init_dcn_offset analog)."""
    net = build_network({'type': 'MRAPARestorationNet', 'ngf': 8,
                         'n_blocks': 1, 'groups': 4, 'alignment': 'flow'})
    rng = np.random.RandomState(4)
    x, pre_offset, ref_feat = _flow_net_inputs(rng)
    params = net.init(jax.random.PRNGKey(1), x, pre_offset, ref_feat)
    head = [leaf for path, leaf in
            jax.tree_util.tree_leaves_with_path(params)
            if 'conv_flow_gate' in jax.tree_util.keystr(path)]
    assert head and all(float(jnp.abs(h).max()) == 0 for h in head)


@pytest.mark.slow
@pytest.mark.parametrize('alignment', ['dcn', 'flow'])
def test_mrapa_alignment_overfit_descends(alignment):
    """Adam actually DESCENDS through the alignment backward (gradient
    direction, not just finiteness): overfitting one fixed target with
    a uniform lr drives L1 to <0.85x its initial value in 60 steps for
    both the DCN path and the flow-warp variant (calibrated: dcn 0.63,
    flow 0.68 on CPU). A sign/plumbing error in the custom bilinear
    gather VJPs would ascend or plateau — the finite-grad and
    params-move tests cannot catch that. lr is 1e-3: at 3e-3 the DCN
    offset convs destabilize sampling positions and the loss climbs
    (the reason the reference trains offsets at 1e-5/1e-6 —
    stage3_5ref_restoration_mse.yml lr_*_offset)."""
    import optax
    net = build_network({'type': 'MRAPARestorationNet', 'ngf': 8,
                         'n_blocks': 1, 'groups': 4,
                         'alignment': alignment})
    rng = np.random.RandomState(3)
    x, pre_offset, ref_feat = _flow_net_inputs(rng)
    params = net.init(jax.random.PRNGKey(0), x, pre_offset, ref_feat)
    out0 = net.apply(params, x, pre_offset, ref_feat)
    target = jnp.asarray(rng.rand(*out0.shape).astype(np.float32))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            return jnp.abs(
                net.apply(p, x, pre_offset, ref_feat) - target).mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < 0.85 * losses[0], (
        alignment, losses[0], losses[-3:])
