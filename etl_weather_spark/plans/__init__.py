"""Physical-plan inspection and lakehouse layout utilities."""
