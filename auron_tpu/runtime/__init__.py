"""Runtime services: metrics/roofline accounting, HBM memory budgeting."""
