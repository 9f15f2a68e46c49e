"""Shared machinery for the reference gradient crosschecks
(benchmarks/*_grad_crosscheck.py): emit reference gradients through an
existing value-mapping by temporarily assigning each variable its own
gradient, and compare gradient trees with relative statistics."""

import numpy as np


def grads_via_value_mapping(variables, grads, mapping_fn):
    """Run ``mapping_fn()`` (which reads variable VALUES) while every
    watched variable temporarily holds its own gradient; restore after.
    Robust against Keras-3 variable wrapper types — no proxying."""
    watched = list(zip(variables, grads))
    saved = [np.asarray(v) for v, _ in watched]
    try:
        for v, g in watched:
            if g is None:
                dense = np.zeros(v.shape, np.float32)
            elif hasattr(g, "indices"):  # tf.IndexedSlices (gather bwd)
                import tensorflow as tf
                dense = np.asarray(tf.convert_to_tensor(g))
            else:
                dense = np.asarray(g)
            v.assign(dense)
        return mapping_fn()
    finally:
        for (v, _), val in zip(watched, saved):
            v.assign(val)


def compare_grad_trees(flat_g_ref, ours_flat, ours64_flat,
                       radix_shared_suffixes=(), scale_floor_rel=1e-7):
    """Per-leaf relative agreement vs the reference gradients.

    ``radix_shared_suffixes``: leaf-name suffixes whose reference weight is
    shared across our radix axis (axis 1) — compared as sum-over-radix.
    Denominators are floored at ``scale_floor_rel`` x the global gradient
    scale (analytically-zero leaves like attention key_bias would divide
    noise by noise).  Returns the summary dict.
    """
    global_scale = max(
        float(np.abs(np.asarray(g)).max()) for g in flat_g_ref.values())
    rels, own_rels, structural = [], [], []
    worst = {"path": None, "rel": 0.0}
    for path, g_ref in flat_g_ref.items():
        g_ours = ours_flat[path]
        g_ours64 = ours64_flat[path]
        g_ref = np.asarray(g_ref)
        if path.split("/")[-1] in radix_shared_suffixes:
            g_ref = g_ref[:, 0]
            g_ours = g_ours.sum(axis=1)
            g_ours64 = g_ours64.sum(axis=1)
        scale = max(float(np.abs(g_ref).max()),
                    scale_floor_rel * global_scale)
        rel = float(np.abs(g_ours - g_ref).max()) / scale
        own = float(np.abs(g_ours64 - g_ours).max()) / scale
        own_rels.append(own)
        rels.append(rel)
        if rel > worst["rel"]:
            worst = {"path": path, "rel": rel, "own_f32_rounding_rel": own}
        # Structural = big AND far beyond the leaf's OWN f32-vs-f64
        # sensitivity: ReLU/flip-boundary leaves show elevated error in
        # both measures (activation boundaries flip under ANY rounding
        # perturbation), while a semantic divergence produces rel >> own.
        if rel > 1e-2 and rel > 50 * max(own, 1e-12):
            structural.append({"path": path, "rel": rel, "own": own})
    rels = np.array(rels)
    return {
        "grad_leaves_checked": len(rels),
        "grad_rel_median": float(np.median(rels)),
        "grad_rel_p90": float(np.percentile(rels, 90)),
        "grad_rel_max": worst,
        "own_f32_rounding_rel_median": float(np.median(own_rels)),
        "structural_divergences_gt_1pct": structural,
        "no_structural_divergence": not structural,
    }


def flatten_grads(tree):
    from flax.traverse_util import flatten_dict
    return {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(tree).items()}
