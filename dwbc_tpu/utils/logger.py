"""Run logging utilities.

Parity with the reference's utils/logger.py:
  * `log_files` snapshots the framework + config sources into the run
    dir for reproducibility (logger.py:39-58);
  * `Logger` accumulates per-step robot state during evaluation and
    renders the 3x3 diagnostic figure (base vel xy/yaw vs command, dof
    pos/vel/torque, contact forces — logger.py:86-151) to a PNG instead
    of an interactive window (headless TPU hosts).
"""

from __future__ import annotations

import os
import shutil
from collections import defaultdict

import numpy as np


def log_files(log_dir: str, repo_root: str | None = None) -> None:
    """Snapshot dwbc_tpu sources into <log_dir>/src for reproducibility."""
    import dwbc_tpu

    repo_root = repo_root or os.path.dirname(os.path.dirname(
        os.path.abspath(dwbc_tpu.__file__)))
    dst = os.path.join(log_dir, "src")
    os.makedirs(dst, exist_ok=True)
    pkg = os.path.join(repo_root, "dwbc_tpu")
    for dirpath, _, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, f), repo_root)
                out = os.path.join(dst, rel)
                os.makedirs(os.path.dirname(out), exist_ok=True)
                shutil.copy2(os.path.join(dirpath, f), out)


class Logger:
    """Per-step eval-state capture + diagnostic plot (logger.py:61-162)."""

    def __init__(self, dt: float):
        self.dt = dt
        self.state_log = defaultdict(list)
        self.rew_log = defaultdict(list)
        self.num_episodes = 0

    def log_state(self, key, value):
        self.state_log[key].append(np.asarray(value))

    def log_states(self, d):
        for k, v in d.items():
            self.log_state(k, v)

    def log_rewards(self, d, num_episodes):
        for k, v in d.items():
            self.rew_log[k].append(float(v) * num_episodes)
        self.num_episodes += num_episodes

    def plot_states(self, out_path: str = "eval_states.png"):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        nb_rows, nb_cols = 3, 3
        fig, axs = plt.subplots(nb_rows, nb_cols, figsize=(14, 10))
        log = {k: np.stack(v) for k, v in self.state_log.items()}
        t = np.arange(len(next(iter(log.values())))) * self.dt

        def plot(ax, keys, title, ylabel):
            for k in keys:
                if k in log:
                    ax.plot(t, log[k], label=k)
            ax.set(title=title, xlabel="time [s]", ylabel=ylabel)
            ax.legend(fontsize=7)

        plot(axs[0, 0], ["base_vel_x", "command_x"], "Base vel x", "m/s")
        plot(axs[0, 1], ["base_vel_y", "command_y"], "Base vel y", "m/s")
        plot(axs[0, 2], ["base_vel_yaw", "command_yaw"], "Base yaw vel", "rad/s")
        plot(axs[1, 0], ["dof_pos", "dof_pos_target"], "DOF position", "rad")
        plot(axs[1, 1], ["dof_vel"], "DOF velocity", "rad/s")
        plot(axs[1, 2], ["dof_torque"], "DOF torque", "Nm")
        plot(axs[2, 0], ["base_vel_z"], "Base vel z", "m/s")
        plot(axs[2, 1], ["contact_forces_z"], "Contact force z", "N")
        plot(axs[2, 2], ["base_height"], "Base height", "m")
        fig.tight_layout()
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
        return out_path

    def print_rewards(self):
        print("Average rewards per second:")
        for k, v in self.rew_log.items():
            print(f"  {k}: {np.sum(np.array(v)) / max(self.num_episodes, 1):.4f}")
