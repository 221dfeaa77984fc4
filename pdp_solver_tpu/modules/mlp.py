"""Parameterised building blocks as pure init/apply functions.

Covers the reference's small neural heads: `MessageAggregator`
(src/pdp/nn/util.py:11-77), `MultiLayerPerceptron` (util.py:83-107),
`Perceptron` (src/pdp/trainer.py:20-29), `PerceptronTanh` (util.py:242-251)
and `nn.GRUCell` / `nn.Linear` equivalents. Parameters are nested dicts of
jnp arrays (a pytree), initialised with the same U(-1/sqrt(fan), 1/sqrt(fan))
scheme PyTorch uses so trained behaviour is comparable.
"""

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch
from pdp_solver_tpu.modules import common


def _uniform(rng, shape, bound):
    return jax.random.uniform(rng, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def linear_init(rng, in_dim, out_dim, bias=True):
    k = 1.0 / jnp.sqrt(jnp.maximum(in_dim, 1)).astype(jnp.float32)
    rw, rb = jax.random.split(rng)
    p = {"w": _uniform(rw, (in_dim, out_dim), k)}
    if bias:
        p["b"] = _uniform(rb, (out_dim,), k)
    return p


def linear_apply(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def perceptron_init(rng, in_dim, hidden_dim, out_dim):
    r1, r2 = jax.random.split(rng)
    return {"l1": linear_init(r1, in_dim, hidden_dim, bias=True),
            "l2": linear_init(r2, hidden_dim, out_dim, bias=False)}


def perceptron_apply(p, x):
    """sigmoid(L2(relu(L1 x))) - reference trainer.py:20-29."""
    return jax.nn.sigmoid(linear_apply(p["l2"],
                                       jax.nn.relu(linear_apply(p["l1"], x))))


def perceptron_tanh_apply(p, x):
    """tanh(L2(relu(L1 x))) - reference util.py:242-251."""
    return jnp.tanh(linear_apply(p["l2"],
                                 jax.nn.relu(linear_apply(p["l1"], x))))


def mlp_init(rng, layer_dims):
    keys = jax.random.split(rng, len(layer_dims) - 1)
    inner = [linear_init(k, layer_dims[i], layer_dims[i + 1], bias=True)
             for i, k in enumerate(keys[:-1])]
    out = linear_init(keys[-1], layer_dims[-2], layer_dims[-1], bias=False)
    return {"inner": inner, "out": out}


def mlp_apply(p, x):
    for layer in p["inner"]:
        x = jax.nn.relu(linear_apply(layer, x))
    return jax.nn.sigmoid(linear_apply(p["out"], x))


def gru_cell_init(rng, in_dim, hidden_dim):
    """torch nn.GRUCell layout: W_ih [in, 3h], W_hh [h, 3h], gate order r,z,n."""
    k = 1.0 / jnp.sqrt(jnp.maximum(hidden_dim, 1)).astype(jnp.float32)
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    return {
        "w_ih": _uniform(r1, (in_dim, 3 * hidden_dim), k),
        "w_hh": _uniform(r2, (hidden_dim, 3 * hidden_dim), k),
        "b_ih": _uniform(r3, (3 * hidden_dim,), k),
        "b_hh": _uniform(r4, (3 * hidden_dim,), k),
    }


def gru_cell_apply(p, x, h):
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


@dataclass(frozen=True)
class AggregatorConfig:
    """Mirrors reference MessageAggregator.__init__ (util.py:14-49)."""
    input_dim: int
    output_dim: int
    mem_hidden_dim: int
    mem_agg_hidden_dim: int
    agg_hidden_dim: int
    feature_dim: int
    include_self: bool


def aggregator_init(rng, cfg: AggregatorConfig):
    p = {}
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    mem_agg = cfg.mem_agg_hidden_dim
    if cfg.mem_hidden_dim > 0 and cfg.mem_agg_hidden_dim > 0:
        p["w1_m"] = linear_init(r1, cfg.input_dim, cfg.mem_hidden_dim, True)
        p["w2_m"] = linear_init(r2, cfg.mem_hidden_dim, mem_agg, False)
    if cfg.agg_hidden_dim > 0 and cfg.mem_agg_hidden_dim > 0:
        if cfg.mem_hidden_dim <= 0:
            mem_agg = cfg.input_dim
        p["w1_a"] = linear_init(r3, mem_agg + cfg.feature_dim,
                                cfg.agg_hidden_dim, True)
        p["w2_a"] = linear_init(r4, cfg.agg_hidden_dim, cfg.output_dim, False)
    return p


def cast_tree(tree, dtype):
    """Cast every leaf to dtype (mixed-precision compute helper)."""
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)


def aggregator_apply(p, cfg: AggregatorConfig, batch: FGBatch, state_e,
                     feature_e, orient: str, edge_mask_e=None, dtype=None):
    """Deep-set aggregation (reference util.py:51-77).

    orient='var': aggregate over each variable's edges (variable_mask);
    orient='clause': over each clause's edges. include_self=False subtracts
    the self message and returns edge-level rows; include_self=True returns
    node-level rows. With dtype=bfloat16 the MLP transforms and reductions
    run in bf16 (MXU fast path) and the result is returned in f32.
    """
    out_dtype = state_e.dtype
    if dtype is not None:
        p = cast_tree(p, dtype)
        state_e = state_e.astype(dtype)
        if feature_e is not None:
            feature_e = feature_e.astype(dtype)
        if edge_mask_e is not None:
            edge_mask_e = edge_mask_e.astype(dtype)
    if cfg.mem_hidden_dim > 0 and cfg.mem_agg_hidden_dim > 0:
        state_e = jax.nn.log_sigmoid(
            linear_apply(p["w2_m"],
                         jax.nn.log_sigmoid(linear_apply(p["w1_m"], state_e))))

    if edge_mask_e is not None:
        state_e = state_e * common.col(edge_mask_e)

    if orient == "var":
        agg = common.scatter_to_vars(batch, state_e)
    else:
        agg = common.scatter_to_clauses(batch, state_e)

    if not cfg.include_self:
        if orient == "var":
            agg = common.gather_from_vars(batch, agg)
        else:
            agg = common.gather_from_clauses(batch, agg)
        agg = agg - state_e  # state_e is already edge-masked

    if feature_e is not None:
        agg = jnp.concatenate([agg, feature_e], axis=1)

    if cfg.agg_hidden_dim > 0 and cfg.mem_agg_hidden_dim > 0:
        agg = jax.nn.log_sigmoid(
            linear_apply(p["w2_a"],
                         jax.nn.log_sigmoid(linear_apply(p["w1_a"], agg))))
    return agg.astype(out_dtype) if dtype is not None else agg
