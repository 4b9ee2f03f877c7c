"""Host shell (L2): headless screenshot renderer + frame-loop driver +
CLI entry point."""
