"""Drop-in import-path compatibility with the reference (``model.*``)."""
