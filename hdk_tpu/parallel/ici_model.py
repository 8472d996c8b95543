"""Analytic ICI scaling model: predicted multi-chip efficiency from
measured single-chip compute time + traced collective bytes.

Real multi-chip hardware is unavailable in this environment (one
tunneled v5e chip), so the ≥80%-scaling north star is evidenced by (a)
exact per-query collective byte counts from the traced programs
(utils/commlog.py) and (b) this roofline model, stated precisely enough
that a pod-slice run can validate the prediction number-for-number.

Model (per device, n devices on one ICI domain):

  T_n = T_compute(1) / n            -- row-parallel compute
      + wire_bytes(n) / B_ici       -- collective payload over ICI
      + n_coll * alpha              -- per-collective launch latency

  efficiency(n) = T_1 / (n * T_n)

``wire_bytes(n)`` comes from commlog.summarize (all_to_all keeps
(n-1)/n of the payload on-wire, ring all-reduce ~2x, all_gather (n-1)x).

Hardware constants (overridable): TPU v5e ICI = 4 links/chip x 400
Gbps/link/direction => ~200 GB/s usable per-device aggregate for
balanced traffic (public v5e spec: 1600 Gbps interchip interconnect per
chip); alpha ~= 5 us per collective (launch + synchronization).
DCN-spanning meshes are NOT modeled — lay shardings so collectives ride
ICI (scaling-book recipe).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List


@dataclass
class IciModel:
    # usable per-device ICI bandwidth, bytes/s (v5e: ~200e9 aggregate)
    ici_bytes_per_sec: float = 200e9
    # per-collective fixed cost, seconds (launch + barrier)
    alpha_per_collective: float = 5e-6

    def predict(self, compute_s_1dev: float, records: List[dict],
                n_devices: int) -> Dict:
        """Efficiency prediction for one query at ``n_devices``.

        ``records``: a commlog capture traced AT ``n_devices`` (shapes —
        and so per-device bytes — depend on the mesh size)."""
        from ..utils import commlog

        s = commlog.summarize(records, n_devices)
        t_compute = compute_s_1dev / max(n_devices, 1)
        t_wire = s["wire_bytes_per_device"] / self.ici_bytes_per_sec
        t_launch = s["n_collectives"] * self.alpha_per_collective
        t_n = t_compute + t_wire + t_launch
        eff = (compute_s_1dev / (n_devices * t_n)) if t_n > 0 else 1.0
        return {
            "n_devices": n_devices,
            "t_compute_s": t_compute,
            "t_wire_s": t_wire,
            "t_launch_s": t_launch,
            "t_total_s": t_n,
            "predicted_efficiency": round(min(eff, 1.0), 4),
            **s,
        }
