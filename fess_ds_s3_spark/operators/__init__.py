"""Relational operators of the engine (filters, seen-set, politeness, ...)."""
