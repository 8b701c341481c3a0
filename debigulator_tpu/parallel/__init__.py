"""Multi-device scale-out: mesh construction, sharded batch decode, ring
window exchange (SURVEY §2.11 / §5.7-5.8)."""
