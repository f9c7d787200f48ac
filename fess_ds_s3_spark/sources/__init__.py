"""Sources & storage: synthetic fixtures, frontier synthesis, snapshot tables."""
