"""Sources: synthetic transcript generation and fixture payload pools."""
