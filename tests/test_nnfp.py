"""Encoder parity tests: shapes, parameter counts, norm variants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nafp_tpu.models.nnfp import FingerPrinter, get_fingerprinter, l2_normalize


def _init(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    # Eager dispatch is ~1 s/op on this box; jit even init.
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return variables, x


# Small config for behavioral tests (full-size compiles are minutes on the
# 1-core CPU test box; param-count tests below use eval_shape instead).
SMALL = dict(emb_sz=16,
             front_hidden_ch=(8, 8, 16, 16, 32, 32, 64, 64))


def _count_via_eval_shape(shape):
    model = FingerPrinter(norm="layer_norm2d")
    x = jnp.zeros(shape, jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    return _n_params(variables)


def _n_params(variables):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))


def test_param_count_1s_model():
    # 1-s input (256, 32, 1). LayerNorm2d carries per-position params, so
    # the count is input-shape-dependent: 16,939,008 for T=32.
    assert _count_via_eval_shape((1, 256, 32, 1)) == 16_939_008


def test_param_count_2s_model_matches_reference():
    # The published 19,224,576 (reference nnfp.py:270-274) corresponds to
    # the 2-s input (256, 63, 1) built in its test() (nnfp.py:266-268).
    assert _count_via_eval_shape((1, 256, 63, 1)) == 19_224_576


def test_output_shape_and_l2_norm():
    model = FingerPrinter(norm="layer_norm2d", **SMALL)
    variables, _ = _init(model, (1, 256, 32, 1))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 256, 32, 1))
    emb = jax.jit(model.apply)(variables, x)
    assert emb.shape == (3, SMALL["emb_sz"])
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1),
                               np.ones(3), atol=1e-5)


def test_front_shape_collapses():
    # Conv stack must reduce (256, 32) -> (1, 1) spatial, flatten = last ch.
    model = FingerPrinter(norm="layer_norm2d", **SMALL)
    variables, _ = _init(model, (1, 256, 32, 1))
    f = jax.jit(lambda v, a: model.apply(v, a, method=model.front))(
        variables, jnp.zeros((2, 256, 32, 1)))
    assert f.shape == (2, SMALL["front_hidden_ch"][-1])


def test_taps_shapes():
    model = FingerPrinter(norm="layer_norm2d", **SMALL)
    variables, _ = _init(model, (1, 256, 32, 1))
    f, f_l2, gf = jax.jit(lambda v, a: model.apply(v, a, method=model.taps))(
        variables, jnp.ones((2, 256, 32, 1)))
    d = SMALL["front_hidden_ch"][-1]
    assert f.shape == (2, d) and f_l2.shape == (2, d) and gf.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f_l2), axis=1), 1.0,
                               atol=1e-5)


@pytest.mark.parametrize("norm", ["layer_norm1d", "batch_norm"])
def test_norm_variants_run(norm):
    model = FingerPrinter(norm=norm, **SMALL)
    x = jnp.ones((2, 256, 32, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    if norm == "batch_norm":
        emb, _ = jax.jit(lambda v, a: model.apply(v, a, train=True,
                                                  mutable=["batch_stats"]))(variables, x)
    else:
        emb = jax.jit(model.apply)(variables, x)
    assert emb.shape == (2, 16)


def test_bfloat16_compute_close_to_f32():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 256, 32, 1))
    m32 = FingerPrinter(dtype=jnp.float32, **SMALL)
    v = jax.jit(m32.init)(jax.random.PRNGKey(0), x)
    e32 = jax.jit(m32.apply)(v, x)
    m16 = FingerPrinter(dtype=jnp.bfloat16, **SMALL)
    e16 = jax.jit(m16.apply)(v, x)
    # Same params; embeddings should be directionally identical.
    cos = np.sum(np.asarray(e32) * np.asarray(e16), axis=1)
    assert cos.min() > 0.98


def test_get_fingerprinter_from_cfg():
    from nafp_tpu.configuration import load_config
    cfg = load_config("default")
    model = get_fingerprinter(cfg)
    assert model.emb_sz == 128 and model.norm == "layer_norm2d"


def test_l2_normalize_matches_tf_semantics():
    x = np.zeros((1, 4), np.float32)  # zero vector must not NaN
    out = np.asarray(l2_normalize(jnp.asarray(x)))
    assert np.isfinite(out).all()


def test_grads_flow():
    model = FingerPrinter(norm="layer_norm2d", dtype=jnp.float32, **SMALL)
    variables, _ = _init(model, (1, 256, 32, 1))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 32, 1))

    def loss_fn(params):
        emb = model.apply({"params": params}, x)
        return jnp.sum(emb ** 2)

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    norms = [np.linalg.norm(np.asarray(v)) for v in jax.tree_util.tree_leaves(g)]
    assert np.isfinite(norms).all()
    assert sum(n > 0 for n in norms) > len(norms) * 0.9


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_act_store_quantized_close_to_full(mode):
    # ACT_STORE stores inter-layer activations at 1 byte/elem for the
    # HBM-bound inference path; embeddings must stay directionally
    # equivalent to the full-precision path (gate for the generate use).
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 256, 32, 1))
    m = FingerPrinter(dtype=jnp.float32, **SMALL)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    e_full = jax.jit(m.apply)(v, x)
    mq = FingerPrinter(dtype=jnp.float32, act_store=mode, **SMALL)
    e_q = jax.jit(mq.apply)(v, x)
    cos = np.sum(np.asarray(e_full) * np.asarray(e_q), axis=1)
    assert cos.min() > 0.95, cos
    # train=True must bypass quantization entirely (round has no gradient)
    e_tr = jax.jit(lambda v, a: mq.apply(v, a, train=True))(v, x)
    np.testing.assert_allclose(np.asarray(e_tr), np.asarray(e_full),
                               atol=1e-5)


def test_act_store_cfg_validation():
    from nafp_tpu.configuration import load_config
    cfg = load_config("default")
    cfg["MODEL"]["ACT_STORE"] = "int4"
    with pytest.raises(ValueError):
        get_fingerprinter(cfg)
    cfg["MODEL"]["ACT_STORE"] = "int8"
    assert get_fingerprinter(cfg).act_store == "int8"
