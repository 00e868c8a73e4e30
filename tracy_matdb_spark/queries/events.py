"""Event-time windowing (tumbling/sliding/session) + as-of join."""
