/* Minimal configure-shim for building the reference's pure-C BLAST core
 * (algo/blast/core) outside the NCBI toolkit build system. Provides the
 * platform defines that corelib/ncbitype.h (the core's ONLY corelib
 * dependency) expects from the autoconf-generated ncbiconf.h.
 * Targets x86-64/aarch64 Linux with glibc. */
#ifndef GBLASTN_TPU_ORACLE_NCBICONF_H
#define GBLASTN_TPU_ORACLE_NCBICONF_H

#define NCBI_OS_LINUX 1
#define NCBI_OS_UNIX 1
#define HAVE_INTTYPES_H 1
#define HAVE_SYS_TYPES_H 1
#define HAVE_UNISTD_H 1
#define HAVE_STRDUP 1
#define HAVE_STRCASECMP 1
#define HAVE_ERF 1

#define SIZEOF_CHAR 1
#define SIZEOF_SHORT 2
#define SIZEOF_INT 4
#define SIZEOF_LONG 8
#define SIZEOF_LONG_LONG 8
#define SIZEOF___INT64 0
#define SIZEOF_VOIDP 8
#define SIZEOF_SIZE_T 8
#define SIZEOF_DOUBLE 8
#define SIZEOF_FLOAT 4
#define SIZEOF_LONG_DOUBLE 16
#define SIZEOF_WCHAR_T 4

#define NCBI_PLATFORM_BITS 64

#endif
