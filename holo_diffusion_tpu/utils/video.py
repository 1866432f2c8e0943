"""Video writing — Implicitron `VideoWriter` equivalent (reference use:
flyaround.py:553-610, holo_diffusion_model.py:598-616).

This image ships no ffmpeg binary: frames are written as PNGs plus an animated
GIF via imageio; an .mp4 is produced when an `ffmpeg` binary exists on PATH.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np


class VideoWriter:
    def __init__(self, out_path: str, fps: int = 20, keep_frames: bool = False):
        self.out_path = out_path
        self.fps = fps
        self.keep_frames = keep_frames
        self._frames = []
        self._frame_dir = out_path + "_frames"

    def write_frame(self, frame: np.ndarray):
        """frame: (H, W, 3) float in [0, 1] or uint8."""
        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            frame = (np.clip(frame, 0.0, 1.0) * 255).astype(np.uint8)
        self._frames.append(frame)

    def get_video(self) -> Optional[str]:
        """Flush frames to disk; returns the written video path."""
        if not self._frames:
            return None
        base, ext = os.path.splitext(self.out_path)
        os.makedirs(os.path.dirname(os.path.abspath(self.out_path)), exist_ok=True)

        if self.keep_frames:
            os.makedirs(self._frame_dir, exist_ok=True)
            import imageio.v3 as iio

            for i, f in enumerate(self._frames):
                iio.imwrite(os.path.join(self._frame_dir, f"frame_{i:05d}.png"), f)

        if ext == ".mp4" and shutil.which("ffmpeg"):
            os.makedirs(self._frame_dir, exist_ok=True)
            import imageio.v3 as iio

            for i, f in enumerate(self._frames):
                iio.imwrite(os.path.join(self._frame_dir, f"frame_{i:05d}.png"), f)
            subprocess.run(
                [
                    "ffmpeg", "-y", "-framerate", str(self.fps),
                    "-i", os.path.join(self._frame_dir, "frame_%05d.png"),
                    "-pix_fmt", "yuv420p", self.out_path,
                ],
                check=True,
                capture_output=True,
            )
            if not self.keep_frames:
                shutil.rmtree(self._frame_dir, ignore_errors=True)
            return self.out_path

        # fallback: animated gif
        gif_path = base + ".gif"
        import imageio.v3 as iio

        iio.imwrite(gif_path, np.stack(self._frames), duration=1000 / self.fps, loop=0)
        return gif_path
