"""Sources: deterministic generators and connector builders."""
