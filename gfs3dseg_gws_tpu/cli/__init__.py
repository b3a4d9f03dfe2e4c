"""Argument parsers and dispatchers mirroring the reference CLIs."""
