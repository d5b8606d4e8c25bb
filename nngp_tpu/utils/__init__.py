"""Host-side utilities: RDS reader, dataset loaders, native-library bindings."""
