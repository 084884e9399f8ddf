"""Numeric primitives: LUT interpolation, pyramids, temporal filters, masking."""
