"""Atlas checkpoint / resume.

The reference ships dormant boost-serialization scaffolding
(``System::SaveAtlas/LoadAtlas``, ``include/Atlas.h:54-73`` — excluded
from its build; SURVEY.md §5 "Checkpoint/resume").  Here the entire atlas
is one flat pytree of arrays, so checkpointing is a single compressed-npz
write — first-class and cheap, as the survey prescribes.

Saved: the full MapState + per-agent tracking state + (optionally) the
server's BoW database and vocabulary, so a resumed session relocalizes
immediately.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.mapstate import state as S


def save_atlas(system, path: str, server=None):
    arrays = {f"ms_{name}": np.asarray(val)
              for name, val in zip(S.MapState._fields, system.ms)}
    n = len(system.agents)
    ag_scalars = np.zeros((n, 5), np.int64)
    ag_has_pose = np.zeros(n, bool)
    ag_q = np.zeros((n, 4), np.float32)
    ag_t = np.zeros((n, 3), np.float32)
    for i, a in enumerate(system.agents):
        ag_scalars[i] = [a.agent_id, a.state, a.map_id, a.ref_kf,
                         a.next_agent_kf_id]
        if a.q is not None:
            ag_has_pose[i] = True
            ag_q[i] = np.asarray(a.q)
            ag_t[i] = np.asarray(a.t)
    srv = {}
    if server is not None and server.voc is not None:
        srv["voc_meta"] = np.asarray([server.voc.k, server.voc.depth])
        srv["voc_idf"] = np.asarray(server.voc.idf)
        for i, lvl in enumerate(server.voc.centroid_bits):
            srv[f"voc_level_{i}"] = np.asarray(lvl)  # packed u8
        if server.voc.leaf_map is not None:
            srv["voc_leaf_map"] = np.asarray(server.voc.leaf_map)
        if server.kf_bow_words is not None:
            srv["kf_bow_words"] = server.kf_bow_words
            srv["kf_bow_vals"] = server.kf_bow_vals
    np.savez_compressed(
        path,
        agent_scalars=ag_scalars, agent_has_pose=ag_has_pose,
        agent_q=ag_q, agent_t=ag_t, **arrays,
        **{f"srv_{k}": v for k, v in srv.items()})


def load_atlas(system, path: str, server=None):
    """Restore MapState (+ agents, + server BoW db) in place."""
    data = np.load(path)
    fields = {}
    for name in S.MapState._fields:
        if f"ms_{name}" in data:
            fields[name] = jnp.asarray(data[f"ms_{name}"])
        elif name == "kf_seq":
            # pre-recycling checkpoints: slots were append-only, so the
            # slot index IS the insertion order
            kf_valid = data["ms_kf_valid"]
            fields[name] = jnp.where(
                jnp.asarray(kf_valid),
                jnp.arange(len(kf_valid), dtype=jnp.int32), S.BIG_SEQ)
        elif name in ("loop_i", "loop_j", "loop_valid"):
            L = 64  # MapConfig.max_loop_edges default
            fields[name] = (jnp.zeros((L,), bool) if name == "loop_valid"
                            else jnp.full((L,), -1, jnp.int32))
        elif name in ("mp_first_agent", "mp_first_agent_kf"):
            # pre-agent-aware-culling checkpoints
            P = data["ms_mp_valid"].shape[0]
            fields[name] = jnp.full((P,), -1, jnp.int32)
        else:
            raise KeyError(f"checkpoint missing MapState field {name}")
    system.ms = S.MapState(**fields)
    # map-id allocation is derived from map_valid + agent map ids — no
    # counter to restore

    ag = data["agent_scalars"]
    for i in range(len(ag)):
        while len(system.agents) <= i:
            system.add_agent()
        a = system.agents[i]
        _, a.state, a.map_id, a.ref_kf, a.next_agent_kf_id = (
            int(v) for v in ag[i])
        if data["agent_has_pose"][i]:
            a.q = jnp.asarray(data["agent_q"][i])
            a.t = jnp.asarray(data["agent_t"][i])

    if server is not None and "srv_voc_idf" in data:
        from mam3slam_tpu.ops import bow

        k, depth = (int(v) for v in data["srv_voc_meta"])
        levels = tuple(jnp.asarray(data[f"srv_voc_level_{i}"].astype(
            np.uint8)) for i in range(depth))
        leaf_map = (jnp.asarray(data["srv_voc_leaf_map"])
                    if "srv_voc_leaf_map" in data else None)
        server.voc = bow.Vocabulary(
            centroid_bits=levels, idf=jnp.asarray(data["srv_voc_idf"]),
            k=k, depth=depth, leaf_map=leaf_map)
        if "srv_kf_bow_words" in data:
            server.kf_bow_words = np.array(data["srv_kf_bow_words"])
            server.kf_bow_vals = np.array(data["srv_kf_bow_vals"])
