"""Scalar/column function library — pure Column expressions, never UDFs
where a built-in expression exists (stays inside whole-stage codegen)."""
