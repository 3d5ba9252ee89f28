"""Reserved for shared utilities (currently empty)."""
