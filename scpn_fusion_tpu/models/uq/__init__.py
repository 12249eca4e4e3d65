"""Uncertainty quantification: Monte Carlo chains + polynomial chaos."""
