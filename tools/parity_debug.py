"""Tick-by-tick divergence dump for one parity scenario.

Usage: python -m tools.parity_debug <scenario> [T] [--car=N] [--fields=a,b]
Prints, per tick, ref vs jax values of selected fields and running error,
so the exact tick where a scenario diverges is visible.
"""
import sys

import numpy as np

from tools import parity, parity_battery


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    T = int(args[1]) if len(args) > 1 else 120
    car = 0
    fields = ["pos", "vel", "ang_vel"]
    for a in sys.argv[1:]:
        if a.startswith("--car="):
            car = int(a.split("=")[1])
        if a.startswith("--fields="):
            fields = a.split("=")[1].split(",")

    sc = parity_battery.scenarios(T)[name]
    ref = parity.run_oracle([sc])[0]
    ours = parity.run_jax(sc)

    gcf = parity.car_trace_field
    for t in range(T):
        parts = [f"t={t:4d}"]
        for f in fields:
            if f.startswith("ball_"):
                sl = {"ball_pos": slice(0, 3), "ball_vel": slice(3, 6),
                      "ball_ang": slice(6, 9)}[f]
                rv, ov = ref["ball"][t, sl], ours["ball"][t, sl]
            else:
                rv = np.atleast_1d(gcf(ref["cars"], f)[t, car])
                ov = np.atleast_1d(gcf(ours["cars"], f)[t, car])
            err = np.abs(rv - ov).max()
            parts.append(f"{f}: ref={np.round(rv, 3)} jax={np.round(ov, 3)} "
                         f"err={err:.3f}")
        print("  ".join(parts))


if __name__ == "__main__":
    main()
