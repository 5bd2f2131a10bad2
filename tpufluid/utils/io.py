"""Checkpoint/resume and image/video export.

The reference has NO checkpointing (SURVEY.md section 5): its only recovery
is the egui "restart simulation" button. Here the complete sim state is a
pytree (state + tick), so checkpointing is a plain ``npz`` round-trip, and
golden-trajectory tests ride on it.

Image export replaces the reference's PNG save path (src/main.rs:180-181):
frames are rendered on device (tpufluid.ops.render) and written with the
native encoder (native/pngio.cpp) when built, falling back to PIL, then to
raw ``.npy``.

Video input (reference component 2.15, src/main.rs:334-358) is gated on an
``ffmpeg`` binary; grayscale frame stacks from ``.npy``/``.npz`` are always
supported.
"""

from __future__ import annotations

import io as _io
import os
import shutil
import subprocess
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..state import ParticleState


# ---------------------------------------------------------------- checkpoint

def save_checkpoint(path: str, state: ParticleState) -> None:
    arrays = {
        "position": np.asarray(state.position),
        "predicted": np.asarray(state.predicted),
        "velocity": np.asarray(state.velocity),
        "density": np.asarray(state.density),
        "cell": np.asarray(state.cell),
        "tick": np.asarray(state.tick),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> ParticleState:
    with np.load(path) as z:
        return ParticleState(
            position=jnp.asarray(z["position"]),
            predicted=jnp.asarray(z["predicted"]),
            velocity=jnp.asarray(z["velocity"]),
            density=jnp.asarray(z["density"]),
            cell=jnp.asarray(z["cell"]),
            tick=jnp.asarray(z["tick"]),
        )


def save_checkpoint_orbax(path: str, state: ParticleState) -> None:
    """Orbax-backed checkpoint (async-capable, multi-host-aware) — the
    production alternative to the npz path."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), dataclasses_to_dict(state))
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str) -> ParticleState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    data = ckptr.restore(os.path.abspath(path))
    return ParticleState(**{k: jnp.asarray(v) for k, v in data.items()})


def dataclasses_to_dict(state: ParticleState) -> dict:
    return {
        "position": state.position, "predicted": state.predicted,
        "velocity": state.velocity, "density": state.density,
        "cell": state.cell, "tick": state.tick,
    }


# ---------------------------------------------------------------- PNG export

def _native_png():
    try:
        from ..native import pngio  # noqa: PLC0415
        return pngio if pngio.available() else None
    except Exception:
        return None


def write_png(path: str, rgba8: np.ndarray) -> str:
    """Write u8[H, W, 4] as PNG. Prefers the native C++ encoder, falls back
    to PIL, then to a raw .npy sidecar. Returns the path written."""
    rgba8 = np.ascontiguousarray(np.asarray(rgba8, dtype=np.uint8))
    native = _native_png()
    if native is not None:
        native.write_rgba(path, rgba8)
        return path
    try:
        from PIL import Image  # noqa: PLC0415
        Image.fromarray(rgba8, "RGBA").save(path)
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".npy"
        np.save(alt, rgba8)
        return alt


def read_png(path: str) -> np.ndarray:
    native = _native_png()
    if native is not None:
        out = native.read_rgba(path)
        if out is not None:
            return out
    from PIL import Image  # noqa: PLC0415
    return np.asarray(Image.open(path).convert("RGBA"))


# ---------------------------------------------------------------- video input

def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def save_mp4(path: str, frames, fps: int = 30) -> str:
    """Encode RGBA frames (iterable of u8[H, W, 4]) to mp4 via an ffmpeg
    subprocess — the headless counterpart of the reference's offline
    render mode (src/main.rs:154-216, which saves PNGs it later encodes).

    Raises RuntimeError when no ffmpeg binary exists (the render CLI
    falls back to PNG frames via the native encoder).
    """
    import subprocess

    if not ffmpeg_available():
        raise RuntimeError(
            "mp4 export needs an ffmpeg binary on PATH; use PNG frames "
            "(utils.io.write_png / `render --out DIR`) instead")
    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    proc = subprocess.Popen(
        ["ffmpeg", "-y", "-loglevel", "error", "-f", "rawvideo",
         "-pix_fmt", "rgba", "-s", f"{w}x{h}", "-r", str(fps), "-i", "-",
         "-pix_fmt", "yuv420p", "-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2",
         path],
        stdin=subprocess.PIPE,
    )
    for f in frames:
        proc.stdin.write(f.tobytes())
    proc.stdin.close()
    if proc.wait() != 0:
        raise RuntimeError("ffmpeg encode failed")
    return path


def load_gray_frames(path: str, max_frames: Optional[int] = None) -> np.ndarray:
    """Grayscale frame stack u8[T, H, W] from .npy/.npz, or any container
    ffmpeg can decode (if an ffmpeg binary exists)."""
    if path.endswith(".npy"):
        frames = np.load(path)
    elif path.endswith(".npz"):
        with np.load(path) as z:
            frames = z[list(z.files)[0]]
    else:
        frames = _ffmpeg_decode_gray(path, max_frames)
    if frames.ndim != 3:
        raise ValueError(f"expected [T, H, W] gray frames, got {frames.shape}")
    if max_frames is not None:
        frames = frames[:max_frames]
    return frames.astype(np.uint8)


def _ffmpeg_decode_gray(path: str, max_frames: Optional[int]) -> np.ndarray:
    if not ffmpeg_available():
        raise RuntimeError(
            "no ffmpeg binary on PATH; provide frames as .npy/.npz instead"
        )
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0",
         "-show_entries", "stream=width,height", "-of", "csv=p=0", path],
        capture_output=True, text=True, check=True,
    )
    w, h = (int(v) for v in probe.stdout.strip().split(","))
    cmd = ["ffmpeg", "-v", "error", "-i", path, "-f", "rawvideo",
           "-pix_fmt", "gray"]
    if max_frames is not None:
        cmd += ["-frames:v", str(max_frames)]
    cmd += ["-"]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    t = len(raw) // (w * h)
    return np.frombuffer(raw[: t * w * h], np.uint8).reshape(t, h, w)


def gray_frame_to_outside_mask(frame: np.ndarray) -> np.ndarray:
    """u8[H, W] -> bool outside mask with the reference's >128 threshold
    (src/main.rs:416): bright pixels are 'outside', dark pixels obstacles."""
    return np.asarray(frame) > 128
