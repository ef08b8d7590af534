"""Small shared host-side helpers."""
