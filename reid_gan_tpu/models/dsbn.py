"""Domain-Specific BatchNorm for UDA testing
(parity: CC/clustercontrast/models/dsbn.py:6-79).

The reference rewrites a trained torch model's BN modules into DSBN (one
(scale, bias, stats) set per domain) and back. In the functional design the
same capability is a variables-level transform: ``convert_dsbn`` duplicates
every BatchNorm subtree into per-domain copies; ``select_domain`` materializes
the variables for one domain (the model itself is unchanged — it always sees
plain BN variables); ``convert_bn`` folds a chosen domain back (dsbn.py:45-79).
"""

import jax


def _is_bn_params(path):
    return any("bn" in str(p).lower() or str(p) == "feat_bn" for p in path)


def convert_dsbn(variables, num_domains=2):
    """variables → dict with every batch_stats leaf + BN param duplicated per
    domain: returns {'domains': {'d0': variables, 'd1': variables, ...}}.
    (dict keys, not a list — flax msgpack state dicts round-trip dicts but
    not python lists, and DSBN checkpoints must survive save/restore)."""
    return {"domains": {f"d{i}": jax.tree_util.tree_map(lambda x: x, variables)
                        for i in range(num_domains)}}


def select_domain(dsbn_variables, domain):
    """Variables for one domain (target=True → domain index 1 in the
    reference convention, dsbn.py convert: target uses its own stats)."""
    return dsbn_variables["domains"][f"d{domain}"]


def update_domain(dsbn_variables, domain, variables):
    doms = dict(dsbn_variables["domains"])
    doms[f"d{domain}"] = variables
    return {"domains": doms}


def convert_bn(dsbn_variables, use_target=True):
    """Collapse back to plain variables keeping the chosen domain's BN state
    (dsbn.py:45-79 convert_bn)."""
    return dsbn_variables["domains"]["d1" if use_target else "d0"]
