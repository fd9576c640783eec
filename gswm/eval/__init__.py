"""Evaluation: bit-accuracy metrics, sweep drivers, and report writers
(reference parity: extract.py:103-175, result.txt / info_data.txt formats)."""

from gswm.eval.metrics import calculate_bit_accuracy, bit_accuracy_bits  # noqa: F401
