/* Single-threaded MT_LOCK stubs for the oracle build.
 *
 * The reference C core links against corelib/connect's MT_LOCK API
 * (include/connect/ncbi_core.h) for optional multi-threaded locking.
 * The oracle driver is single-threaded and never creates a lock, so
 * every MT_LOCK handle is NULL: MT_LOCK_Do(lk, how) short-circuits to
 * -1 without calling MT_LOCK_DoInternal, and MT_LOCK_Delete(NULL) is
 * a no-op. These stubs satisfy the linker only.
 */
#include <connect/ncbi_core.h>

MT_LOCK MT_LOCK_Delete(MT_LOCK lk) {
    (void) lk;
    return NULL;
}

MT_LOCK MT_LOCK_AddRef(MT_LOCK lk) {
    return lk;
}

int MT_LOCK_DoInternal(MT_LOCK lk, EMT_Lock how) {
    (void) lk;
    (void) how;
    return -1;
}
