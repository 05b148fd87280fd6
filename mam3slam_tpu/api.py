"""Public API facade: MultiAgentSystem / Agent.

Mirrors the reference's layer-9 API (``include/MultiAgentSystem.h:65-96``,
``include/Agent.h:182-249`` — SURVEY.md §2.1): construct the shared system,
``add_agent(settings_yaml)``, feed images with ``track_monocular``, query
``get_agents_in_map``, ``shutdown`` + artifact export.

Differences from the reference, by design:
* no vocabulary text file is required — the BoW vocabulary is trained from
  the stream (or pass one built with ``ops.bow.build_vocabulary``);
* per-agent calibrations are supported (per-KF intrinsics flow through
  matching/triangulation/BA); settings must agree on image geometry and
  camera KIND (shared batched device pipelines);
* the viewer is headless (io/viewer.py) — no Pangolin.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from mam3slam_tpu.io import settings as settings_mod
from mam3slam_tpu.io import writers
from mam3slam_tpu.ops import bow as bow_mod
from mam3slam_tpu.ops import orb as orb_mod
from mam3slam_tpu.slam import steps
from mam3slam_tpu.slam.server import LoopServer, ServerConfig
from mam3slam_tpu.slam.system import SlamConfig, SlamSystem


class MultiAgentSystem:
    """Owns the shared map state, the centralized loop server, and agents."""

    def __init__(self, vocabulary: Optional[bow_mod.Vocabulary] = None,
                 active_loop_closing: bool = True,
                 server_config: Optional[ServerConfig] = None,
                 slam_config: Optional[SlamConfig] = None, seed: int = 0,
                 async_mapping: bool = False,
                 pipeline: bool = False,
                 slam_overrides: Optional[dict] = None):
        self._vocab = vocabulary
        self._active_lc = active_loop_closing
        self._server_cfg = server_config or ServerConfig()
        self._slam_cfg = slam_config
        self._slam_overrides = slam_overrides or {}
        self._seed = seed
        self._async_mapping = async_mapping
        # depth-1 pipelined tracking: track_monocular returns the
        # PREVIOUS frame's (state, pose); the result readback overlaps
        # the next frame's work (high-latency links).  shutdown()/flush
        # drain the pending frame.
        self._pipeline = pipeline
        self.sys: Optional[SlamSystem] = None
        self.server: Optional[LoopServer] = None
        self._settings: List[settings_mod.Settings] = []
        self._orb_cfgs = []
        self._extract_fns = []

    # -- reference: MultiAgentSystem::addAgent(settingsYaml) ----------------
    def add_agent(self, settings_yaml: str) -> int:
        import jax

        st = settings_mod.load_settings(settings_yaml)
        W, H = st.eff_width, st.eff_height  # after Camera.newWidth resize
        if self._vocab is None:
            # reference-parity default: a full-scale vocabulary file
            # ($MAM3_VOCAB or data/ORBvoc.txt) is loaded at startup when
            # present (MultiAgentSystem ctor, src/MultiAgentSystem.cc:22)
            self._vocab = bow_mod.default_vocabulary()
        if self.sys is None:
            cfg = self._slam_cfg or SlamConfig(
                width=W, height=H,
                cam_kind=st.camera().kind,
                n_levels=st.n_levels, scale_factor=st.scale_factor,
                n_feat=orb_mod.OrbConfig(
                    height=H, width=W,
                    n_features=st.n_features, n_levels=st.n_levels,
                    scale_factor=st.scale_factor).capacity)
            if self._slam_overrides:
                import dataclasses
                cfg = dataclasses.replace(cfg, **self._slam_overrides)
            self.sys = SlamSystem(cfg, st.camera(), seed=self._seed,
                                  async_mapping=self._async_mapping)
            self.sys.pipeline = self._pipeline
            if self._active_lc:
                self.server = LoopServer(self.sys, self._server_cfg,
                                         vocab=self._vocab,
                                         seed=self._seed)
                self.sys.server = self.server
        else:
            if (W, H) != (self._settings[0].eff_width,
                          self._settings[0].eff_height):
                raise ValueError(
                    "all agents must share image geometry in this build")
        self._settings.append(st)
        ocfg = orb_mod.OrbConfig(
            height=H, width=W, n_features=st.n_features,
            n_levels=st.n_levels, scale_factor=st.scale_factor,
            ini_th=st.ini_th_fast, min_th=st.min_th_fast)
        self._orb_cfgs.append(ocfg)
        cam = st.camera()

        @jax.jit
        def extract(img):
            feats = orb_mod.extract_orb(img, ocfg)
            feats = orb_mod.with_undistorted(feats, cam)
            return feats

        self._extract_fns.append(extract)
        return self.sys.add_agent(cam=cam)

    # -- reference: Agent::TrackMonocular ----------------------------------
    def track_monocular(self, agent_id: int, image: np.ndarray, ts: float):
        """Grayscale image [H, W] (uint8 or f32 0..255) -> (state, pose).
        A device-resident jax array of the right geometry is consumed
        as-is (no host round-trip — pre-staged camera buffers)."""
        import jax
        import jax.numpy as jnp

        st = self._settings[agent_id]
        if (isinstance(image, jax.Array)
                and image.shape == (st.eff_height, st.eff_width)):
            img = (image if image.dtype == jnp.float32
                   else image.astype(jnp.float32))
        else:
            img_np = np.asarray(image, np.float32)
            if img_np.shape != (st.eff_height, st.eff_width):
                # settings-requested resize (reference
                # Agent::TrackMonocular cv::resize, src/Agent.cc:135-140)
                import cv2
                img_np = cv2.resize(img_np,
                                    (st.eff_width, st.eff_height),
                                    interpolation=cv2.INTER_AREA)
            img = jnp.asarray(img_np)
        feats = self._extract_fns[agent_id](img)
        frame = steps.FrameObs(uv=feats.uv, level=feats.level,
                               angle=feats.angle, desc=feats.desc,
                               valid=feats.valid)
        return self.sys.track(agent_id, frame, ts)

    # -- reference: MultiAgentSystem::GetAgentsInMap ------------------------
    def get_agents_in_map(self, map_id: int) -> List[int]:
        return [a.agent_id for a in self.sys.agents if a.map_id == map_id]

    @property
    def agents(self):
        return self.sys.agents if self.sys else []

    # -- reference: Shutdown + Save* ---------------------------------------
    def shutdown(self, out_dir: Optional[str] = None):
        """Drain the mapping queue + background GBA, join the worker
        thread (reference MultiAgentSystem::Shutdown joins all agent
        threads, src/MultiAgentSystem.cc:79-89), then export artifacts."""
        if self.sys is not None:
            self.sys.shutdown()
        if out_dir:
            writers.save_all(self.sys, self.server, out_dir)

    def save_kf_trajectory(self, path: str):
        writers.save_kf_trajectory(self.sys, path)

    def save_trajectory(self, agent_id: int, path: str):
        writers.save_trajectory(self.sys, agent_id, path)

    def save_times(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        for a in self.sys.agents:
            writers.save_times(self.sys, a.agent_id,
                               os.path.join(out_dir,
                                            f"TimesT_{a.agent_id}.txt"))
