"""Hardware modelling: on-chip SRAM allocation simulator."""
