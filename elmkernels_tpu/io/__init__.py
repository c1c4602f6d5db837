"""Native + scipy IO backends."""
