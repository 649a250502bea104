"""Stateful components: seen-filters and the sharded URL frontier."""
