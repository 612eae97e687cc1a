"""tuning subpackage."""
