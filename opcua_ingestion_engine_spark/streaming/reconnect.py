"""T5 — the reconnect/backoff policy, extracted as a pure state machine.

The reference's reconnect loop (``Services/OpcSubscribeService.cs:873-957``)
runs two nested layers per server URL:

- **TCP probe layer** (outer): while the TCP endpoint is unreachable,
  sleep a piecewise-LINEAR schedule — constant ``base=30 s`` through
  iteration 100 (leg-1 slope is literally ``(30-30)/99 = 0``), then a
  ramp of ``(600-30)/100 = 5.7 s`` per iteration up to iteration 200,
  capped at ``600 s`` after that (``:879-891,936-951``).
- **OPC UA attempt layer** (inner): once TCP answers, try the full
  subscribe; on failure sleep ``opcDelaySeconds`` starting at **1 s and
  DOUBLING each attempt** (``:914-917``). If TCP drops mid-way, reset the
  OPC delay to 1 s AND the TCP layer to (30 s, iteration 1), and fall
  back to the probe layer (``:919-927``).
- Success exits the machine; the next outage starts fresh.

Spark-first placement: in this engine reconnection is CONNECTOR-INTERNAL
— Structured Streaming's offset/commit protocol already replays
partitions, so the only reference behavior that needs reproducing is the
*pacing* of re-subscribe attempts against the external server. That
pacing lives here as a dependency-free class the connector (or any
foreachBatch health loop) drives with events; being pure, its schedule is
unit-testable against hand-computed values from the reference's formulas
(tests/test_streaming.py::test_reconnect_policy_*), which is exactly what
"T5 full" requires — no sleeping in tests, no wall clock in the logic.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def tcp_probe_delay_s(
    iteration: int,
    base_s: float = 30.0,
    leg1_end_iter: int = 100,
    leg1_end_s: float | None = None,
    leg2_end_iter: int = 200,
    leg2_end_s: float = 600.0,
) -> float:
    """Delay before TCP probe ``iteration`` (1-based), per the reference's
    piecewise-linear schedule. With the hard-coded constants: 30 s flat
    through iteration 100, +5.7 s per iteration to 600 s at 200, capped.

    ``leg1_end_s`` defaults to ``base_s`` so leg 1 stays FLAT at any
    configured base (the reference's leg-1 slope is identically zero:
    ``(30-30)/99``); pinning it to the literal 30 would silently ramp a
    non-default base toward 30 across the first hundred probes.
    """
    if iteration < 1:
        raise ValueError(f"iteration is 1-based, got {iteration}")
    if leg1_end_s is None:
        leg1_end_s = base_s
    leg1_slope = (leg1_end_s - base_s) / (leg1_end_iter - 1)
    leg2_slope = (leg2_end_s - leg1_end_s) / (leg2_end_iter - leg1_end_iter)
    if iteration >= leg2_end_iter:
        return leg2_end_s
    if iteration <= leg1_end_iter:
        return base_s + leg1_slope * (iteration - 1)
    return leg1_end_s + leg2_slope * (iteration - leg1_end_iter)


@dataclass
class ReconnectPolicy:
    """Stateful mirror of the reference's reconnect machine. Drive it with
    events; read ``next_delay_s()`` for the sleep it would take. States:
    ``probing_tcp`` -> ``attempting_opc`` -> ``connected``."""

    base_s: float = 30.0
    opc_initial_s: float = 1.0
    # Safety cap ABSENT from the reference (its opcDelaySeconds doubles
    # unbounded — :916-917 — so ~25 straight failures push the next retry
    # out by a year). Matches the TCP layer's 600 s ceiling; set to
    # float("inf") for literal reference behavior.
    opc_max_s: float = 600.0
    state: str = field(default="probing_tcp", init=False)
    tcp_iteration: int = field(default=1, init=False)
    opc_delay_s: float = field(default=1.0, init=False)

    def __post_init__(self):
        self.opc_delay_s = self.opc_initial_s

    def next_delay_s(self) -> float:
        if self.state == "probing_tcp":
            return tcp_probe_delay_s(self.tcp_iteration, base_s=self.base_s)
        if self.state == "attempting_opc":
            return self.opc_delay_s
        return 0.0  # connected — no wait

    # -- events -------------------------------------------------------------

    def tcp_probe_failed(self) -> None:
        """TCP endpoint still dark: advance the probe schedule (:951)."""
        self.state = "probing_tcp"
        self.tcp_iteration += 1

    def tcp_probe_succeeded(self) -> None:
        """TCP answers: move to OPC UA attempts (:898-901)."""
        self.state = "attempting_opc"

    def opc_attempt_failed(self, tcp_still_up: bool = True) -> None:
        """Subscribe failed. Doubles the OPC delay (:916-917); if TCP also
        dropped, reset BOTH layers and fall back to probing (:919-927)."""
        if tcp_still_up:
            self.state = "attempting_opc"
            self.opc_delay_s = min(self.opc_delay_s * 2, self.opc_max_s)
        else:
            self.state = "probing_tcp"
            self.opc_delay_s = self.opc_initial_s
            self.tcp_iteration = 1

    def opc_attempt_succeeded(self) -> None:
        """Subscribed — machine exits; a later outage starts fresh (:907)."""
        self.state = "connected"
        self.opc_delay_s = self.opc_initial_s
        self.tcp_iteration = 1
