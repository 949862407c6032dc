/**
 * eventql_tpu C client library — public API.
 *
 * The client-side subset of the reference's C API surface
 * (reference: src/eventql/eventql.h:160-298) over the framed binary
 * protocol (doc/internals/binary_protocol.txt). Implementation is a
 * fresh blocking-socket client written against the wire spec; see
 * evql_client.c.
 */
#ifndef EVQL_TPU_CLIENT_H
#define EVQL_TPU_CLIENT_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

struct evql_client_s;
typedef struct evql_client_s evql_client_t;

evql_client_t* evql_client_init();

int evql_client_setauth(
    evql_client_t* client,
    const char* key,
    size_t key_len,
    const char* val,
    size_t val_len,
    long flags);

int evql_client_connect(
    evql_client_t* client,
    const char* host,
    unsigned int port,
    const char* database,
    long flags);

int evql_query(
    evql_client_t* client,
    const char* query_string,
    const char* database,
    long flags);

/* -1 error, 0 EOF, 1 row read */
int evql_fetch_row(
    evql_client_t* client,
    const char*** fields,
    size_t** field_lengths);

int evql_column_name(
    evql_client_t* client,
    size_t column_index,
    const char** name,
    size_t* name_len);

int evql_num_columns(evql_client_t* client, size_t* ncols);

int evql_discard_result(evql_client_t* client);

/* -1 error, 0 no more results, 1 next result ready */
int evql_next_result(evql_client_t* client);

void evql_client_releasebuffers(evql_client_t* client);

const char* evql_client_geterror(evql_client_t* client);

int evql_client_close(evql_client_t* client);

void evql_client_destroy(evql_client_t* client);

#ifdef __cplusplus
}
#endif

#endif
