"""Operational tooling: real-artifact parity kit, golden capture/replay.

These tools execute the PUBLIC reference implementation side-by-side with
this framework; they are not needed for training or serving.
"""
