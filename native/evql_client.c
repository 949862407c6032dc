/**
 * eventql_tpu C client library.
 *
 * Blocking-socket client for the framed binary protocol:
 *   frame    = {opcode u16 BE}{flags u16 BE}{length u32 BE}{payload}
 *   varint   = LEB128; lenencstr = varint length + bytes
 *   HELLO    varint protover=1, lenencstr version, varint flags,
 *            varint idle_timeout, varint authdata_len + "k\0v\0..."
 *   QUERY    lenencstr query, varint flags, varint maxrows
 *   RESULT   varint flags, varint ncols, varint nrows, [4x varint
 *            stats], ncols lenencstr names, rows as lenencstr cells
 * (wire layout per the reference's doc/internals/binary_protocol.txt
 * and transport/native/frames; API surface per eventql.h:160-298.)
 *
 * Results are fully buffered; fetch_row returns pointers into the
 * buffered payload (cells are NUL-terminated by shifting into an
 * auxiliary arena so callers can treat fields as C strings).
 */

#include "evql.h"

#include <arpa/inet.h>
#include <netdb.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

#define OP_HELLO 0x5e00
#define OP_PING 0x0001
#define OP_HEARTBEAT 0x0002
#define OP_ERROR 0x0003
#define OP_READY 0x0004
#define OP_BYE 0x0005
#define OP_QUERY 0x0006
#define OP_QUERY_RESULT 0x0007
#define OP_QUERY_PROGRESS 0x000a
#define OP_QUERY_NEXT 0x000b
#define OP_QUERY_CONTINUE 0x0008
#define OP_QUERY_DISCARD 0x0009

/* reference: connection.h:34 kMaxFrameSize — a peer frame larger than
 * 256 MB is a protocol violation, not something to buffer */
#define MAX_FRAME_SIZE (256ul * 1024 * 1024)
/* result page size when EVQL_CLIENT_OPT_ROWBUFLEN is unset (sent as
 * the QUERY frame's maxrows; the server pages after batch_size+1 rows
 * and waits for QUERY_CONTINUE — reference: ops/query.cc:150-193) */
#define DEFAULT_BATCH_SIZE 4096

#define F_ENDOFREQUEST 0x1

#define QR_COMPLETE 0x1
#define QR_HASSTATS 0x2
#define QR_HASCOLNAMES 0x4
#define QR_PENDINGSTMT 0x8

struct evql_client_s {
  int fd;
  char error[1024];
  /* auth data pairs, "k\0v\0" packed */
  char* authdata;
  size_t authdata_len;
  /* current result */
  char* payload; /* owned copy of the result frame payload */
  size_t ncols;
  char** col_names;
  size_t* col_name_lens;
  size_t nrows;
  size_t row_cursor;
  const char** row_fields; /* scratch for fetch_row */
  size_t* row_lens;
  size_t* row_offsets; /* start offset of each row in payload */
  int pending_stmt;
  int islast; /* current frame has QR_COMPLETE (no more pages) */
  int result_valid;
  /* options (evql_client_setopt) */
  uint64_t timeout_us;
  uint64_t batch_size;
  /* progress stats from QUERY_PROGRESS frames (evql_client_getstat) */
  uint64_t progress_num_rows_modified;
  uint64_t progress_num_rows_scanned;
  uint64_t progress_num_bytes_scanned;
  uint64_t progress_permill;
  uint64_t progress_elapsed_ms;
  uint64_t progress_eta_ms;
  void (*progress_cb)(evql_client_t*, void*);
  void* progress_cb_opaque;
};

static int evql_client_handshake(evql_client_t* client, int fd);

/* -- wire helpers --------------------------------------------------------- */

static int write_all(int fd, const void* buf, size_t n) {
  const char* p = (const char*)buf;
  while (n > 0) {
    ssize_t w = write(fd, p, n);
    if (w <= 0) return -1;
    p += w;
    n -= (size_t)w;
  }
  return 0;
}

static int read_all(int fd, void* buf, size_t n) {
  char* p = (char*)buf;
  while (n > 0) {
    ssize_t r = read(fd, p, n);
    if (r <= 0) return -1;
    p += r;
    n -= (size_t)r;
  }
  return 0;
}

static size_t varint_encode(uint64_t v, unsigned char* out) {
  size_t n = 0;
  do {
    unsigned char b = v & 0x7f;
    v >>= 7;
    out[n++] = v ? (b | 0x80) : b;
  } while (v);
  return n;
}

static int varint_decode(const unsigned char* buf, size_t len, size_t* pos,
                         uint64_t* out) {
  uint64_t v = 0;
  int shift = 0;
  while (*pos < len) {
    unsigned char b = buf[(*pos)++];
    v |= (uint64_t)(b & 0x7f) << shift;
    if (!(b & 0x80)) {
      *out = v;
      return 0;
    }
    shift += 7;
  }
  return -1;
}

static int send_frame(int fd, uint16_t opcode, uint16_t flags,
                      const void* payload, size_t len) {
  unsigned char hdr[8];
  hdr[0] = opcode >> 8;
  hdr[1] = opcode & 0xff;
  hdr[2] = flags >> 8;
  hdr[3] = flags & 0xff;
  hdr[4] = (len >> 24) & 0xff;
  hdr[5] = (len >> 16) & 0xff;
  hdr[6] = (len >> 8) & 0xff;
  hdr[7] = len & 0xff;
  if (write_all(fd, hdr, 8)) return -1;
  if (len && write_all(fd, payload, len)) return -1;
  return 0;
}

static int recv_frame(int fd, uint16_t* opcode, uint16_t* flags,
                      unsigned char** payload, size_t* len) {
  unsigned char hdr[8];
  if (read_all(fd, hdr, 8)) return -1;
  *opcode = ((uint16_t)hdr[0] << 8) | hdr[1];
  *flags = ((uint16_t)hdr[2] << 8) | hdr[3];
  *len = ((size_t)hdr[4] << 24) | ((size_t)hdr[5] << 16) |
         ((size_t)hdr[6] << 8) | hdr[7];
  *payload = NULL;
  if (*len > MAX_FRAME_SIZE) return -1;
  if (*len) {
    *payload = (unsigned char*)malloc(*len);
    if (!*payload) return -1;
    if (read_all(fd, *payload, *len)) {
      free(*payload);
      *payload = NULL;
      return -1;
    }
  }
  return 0;
}

/* -- client --------------------------------------------------------------- */

evql_client_t* evql_client_init() {
  evql_client_t* c = (evql_client_t*)calloc(1, sizeof(evql_client_t));
  if (c) c->fd = -1;
  return c;
}

static void set_error(evql_client_t* c, const char* msg, size_t len) {
  if (len >= sizeof(c->error)) len = sizeof(c->error) - 1;
  memcpy(c->error, msg, len);
  c->error[len] = 0;
}

int evql_client_setauth(evql_client_t* client, const char* key, size_t key_len,
                        const char* val, size_t val_len, long flags) {
  (void)flags;
  size_t add = key_len + 1 + val_len + 1;
  char* nd = (char*)realloc(client->authdata, client->authdata_len + add);
  if (!nd) return -1;
  client->authdata = nd;
  memcpy(nd + client->authdata_len, key, key_len);
  nd[client->authdata_len + key_len] = 0;
  memcpy(nd + client->authdata_len + key_len + 1, val, val_len);
  nd[client->authdata_len + add - 1] = 0;
  client->authdata_len += add;
  return 0;
}

int evql_client_connect(evql_client_t* client, const char* host,
                        unsigned int port, const char* database, long flags) {
  (void)flags;
  struct addrinfo hints, *res = NULL;
  memset(&hints, 0, sizeof(hints));
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  char portstr[16];
  snprintf(portstr, sizeof(portstr), "%u", port);
  if (getaddrinfo(host, portstr, &hints, &res) || !res) {
    set_error(client, "resolve failed", 14);
    return -1;
  }
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen)) {
    freeaddrinfo(res);
    if (fd >= 0) close(fd);
    set_error(client, "connect failed", 14);
    return -1;
  }
  freeaddrinfo(res);

  if (database && *database) {
    evql_client_setauth(client, "database", 8, database, strlen(database), 0);
  }

  return evql_client_handshake(client, fd);
}

/* HELLO handshake over an already-connected socket (shared by
 * evql_client_connect and evql_client_connectfd —
 * reference: client.c:1055-1075). */
static int evql_client_handshake(evql_client_t* client, int fd) {
  if (client->timeout_us) {
    struct timeval tv;
    tv.tv_sec = (time_t)(client->timeout_us / 1000000);
    tv.tv_usec = (suseconds_t)(client->timeout_us % 1000000);
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
  }
  /* HELLO */
  unsigned char buf[2048];
  size_t pos = 0;
  pos += varint_encode(1, buf + pos); /* protocol version */
  const char* ver = "eventql_tpu cclient v0.1";
  pos += varint_encode(strlen(ver), buf + pos);
  memcpy(buf + pos, ver, strlen(ver));
  pos += strlen(ver);
  pos += varint_encode(0, buf + pos); /* flags */
  pos += varint_encode(0, buf + pos); /* idle timeout */
  pos += varint_encode(client->authdata_len, buf + pos);
  if (client->authdata_len && client->authdata_len < sizeof(buf) - pos) {
    memcpy(buf + pos, client->authdata, client->authdata_len);
    pos += client->authdata_len;
  }
  if (send_frame(fd, OP_HELLO, 0, buf, pos)) {
    close(fd);
    set_error(client, "handshake write failed", 22);
    return -1;
  }

  uint16_t opcode, fflags;
  unsigned char* payload;
  size_t plen;
  if (recv_frame(fd, &opcode, &fflags, &payload, &plen)) {
    close(fd);
    set_error(client, "handshake read failed", 21);
    return -1;
  }
  if (opcode == OP_ERROR) {
    size_t p = 0;
    uint64_t mlen = 0;
    if (!varint_decode(payload, plen, &p, &mlen) && p + mlen <= plen) {
      set_error(client, (const char*)payload + p, mlen);
    } else {
      set_error(client, "handshake rejected", 18);
    }
    free(payload);
    close(fd);
    return -1;
  }
  free(payload);
  if (opcode != OP_READY) {
    close(fd);
    set_error(client, "unexpected opcode in handshake", 30);
    return -1;
  }
  client->fd = fd;
  return 0;
}

void evql_client_releasebuffers(evql_client_t* client) {
  free(client->payload);
  client->payload = NULL;
  free(client->col_names);
  client->col_names = NULL;
  free(client->col_name_lens);
  client->col_name_lens = NULL;
  free(client->row_fields);
  client->row_fields = NULL;
  free(client->row_lens);
  client->row_lens = NULL;
  free(client->row_offsets);
  client->row_offsets = NULL;
  client->ncols = 0;
  client->nrows = 0;
  client->row_cursor = 0;
  client->result_valid = 0;
}

/* parse one QUERY_RESULT payload into client state; takes ownership */
static int parse_result(evql_client_t* client, unsigned char* payload,
                        size_t plen) {
  evql_client_releasebuffers(client);
  client->payload = (char*)payload;

  size_t pos = 0;
  uint64_t qflags, ncols, nrows;
  if (varint_decode(payload, plen, &pos, &qflags) ||
      varint_decode(payload, plen, &pos, &ncols) ||
      varint_decode(payload, plen, &pos, &nrows)) {
    set_error(client, "malformed result", 16);
    return -1;
  }
  if (qflags & QR_HASSTATS) {
    uint64_t tmp;
    for (int i = 0; i < 4; i++) {
      if (varint_decode(payload, plen, &pos, &tmp)) return -1;
    }
  }
  client->ncols = ncols;
  client->nrows = nrows;
  client->pending_stmt = (qflags & QR_PENDINGSTMT) ? 1 : 0;
  client->islast = (qflags & QR_COMPLETE) ? 1 : 0;
  client->col_names = (char**)calloc(ncols ? ncols : 1, sizeof(char*));
  client->col_name_lens = (size_t*)calloc(ncols ? ncols : 1, sizeof(size_t));
  client->row_fields =
      (const char**)calloc(ncols ? ncols : 1, sizeof(char*));
  client->row_lens = (size_t*)calloc(ncols ? ncols : 1, sizeof(size_t));
  client->row_offsets = (size_t*)calloc(nrows ? nrows : 1, sizeof(size_t));

  if (qflags & QR_HASCOLNAMES) {
    for (uint64_t i = 0; i < ncols; i++) {
      uint64_t nlen;
      if (varint_decode(payload, plen, &pos, &nlen) || pos + nlen > plen) {
        return -1;
      }
      client->col_names[i] = (char*)payload + pos;
      client->col_name_lens[i] = nlen;
      pos += nlen;
    }
  }
  for (uint64_t r = 0; r < nrows; r++) {
    client->row_offsets[r] = pos;
    for (uint64_t cidx = 0; cidx < ncols; cidx++) {
      uint64_t cl;
      if (varint_decode(payload, plen, &pos, &cl) || pos + cl > plen) {
        return -1;
      }
      pos += cl;
    }
  }
  client->row_cursor = 0;
  client->result_valid = 1;
  return 0;
}

static int read_result(evql_client_t* client) {
  for (;;) {
    uint16_t opcode, fflags;
    unsigned char* payload;
    size_t plen;
    if (recv_frame(client->fd, &opcode, &fflags, &payload, &plen)) {
      set_error(client, "connection lost", 15);
      return -1;
    }
    if (opcode == OP_QUERY_PROGRESS) {
      /* varints: rows_modified, rows_scanned, bytes_scanned, permill,
       * elapsed_ms, eta_ms (reference: frames/query_progress.cc:63-70) */
      size_t pp = 0;
      uint64_t v[6] = {0, 0, 0, 0, 0, 0};
      for (int i = 0; i < 6; i++) {
        if (varint_decode(payload, plen, &pp, &v[i])) break;
      }
      client->progress_num_rows_modified = v[0];
      client->progress_num_rows_scanned = v[1];
      client->progress_num_bytes_scanned = v[2];
      client->progress_permill = v[3];
      client->progress_elapsed_ms = v[4];
      client->progress_eta_ms = v[5];
      if (client->progress_cb) {
        client->progress_cb(client, client->progress_cb_opaque);
      }
      free(payload);
      continue;
    }
    if (opcode == OP_HEARTBEAT) {
      free(payload);
      continue;
    }
    if (opcode == OP_ERROR) {
      size_t p = 0;
      uint64_t mlen = 0;
      if (!varint_decode(payload, plen, &p, &mlen) && p + mlen <= plen) {
        set_error(client, (const char*)payload + p, mlen);
      } else {
        set_error(client, "query failed", 12);
      }
      free(payload);
      return -1;
    }
    if (opcode != OP_QUERY_RESULT) {
      free(payload);
      set_error(client, "unexpected opcode", 17);
      return -1;
    }
    return parse_result(client, payload, plen);
  }
}

int evql_query(evql_client_t* client, const char* query_string,
               const char* database, long flags) {
  if (client->fd < 0) {
    set_error(client, "not connected", 13);
    return -1;
  }
  uint64_t qflags = (uint64_t)flags;
  size_t dlen = 0;
  if (database && *database) {
    qflags |= 0x1; /* EVQL_QUERY_SWITCHDB */
    dlen = strlen(database);
  }
  size_t qlen = strlen(query_string);
  unsigned char* buf = (unsigned char*)malloc(qlen + dlen + 48);
  if (!buf) return -1;
  size_t pos = 0;
  pos += varint_encode(qlen, buf + pos);
  memcpy(buf + pos, query_string, qlen);
  pos += qlen;
  pos += varint_encode(qflags, buf + pos); /* flags */
  pos += varint_encode(/* maxrows: result page size */
      client->batch_size ? client->batch_size : DEFAULT_BATCH_SIZE,
      buf + pos);
  if (qflags & 0x1) {
    pos += varint_encode(dlen, buf + pos);
    memcpy(buf + pos, database, dlen);
    pos += dlen;
  }
  int rc = send_frame(client->fd, OP_QUERY, 0, buf, pos);
  free(buf);
  if (rc) {
    set_error(client, "send failed", 11);
    return -1;
  }
  return read_result(client);
}

int evql_fetch_row(evql_client_t* client, const char*** fields,
                   size_t** field_lengths) {
  if (!client->result_valid) {
    set_error(client, "no result", 9);
    return -1;
  }
  /* page exhausted but statement incomplete: pull the next page with
   * QUERY_CONTINUE (reference: client.c evql_fetch_row's
   * evql_client_query_continue loop) */
  while (client->row_cursor >= client->nrows) {
    if (client->islast) return 0; /* eof */
    if (send_frame(client->fd, OP_QUERY_CONTINUE, 0, NULL, 0)) {
      set_error(client, "send failed", 11);
      return -1;
    }
    if (read_result(client)) return -1;
  }
  unsigned char* payload = (unsigned char*)client->payload;
  size_t pos = client->row_offsets[client->row_cursor];
  for (size_t i = 0; i < client->ncols; i++) {
    uint64_t cl;
    varint_decode(payload, (size_t)-1, &pos, &cl);
    client->row_fields[i] = client->payload + pos;
    client->row_lens[i] = cl;
    pos += cl;
  }
  client->row_cursor++;
  *fields = client->row_fields;
  *field_lengths = client->row_lens;
  return 1;
}

int evql_column_name(evql_client_t* client, size_t column_index,
                     const char** name, size_t* name_len) {
  if (!client->result_valid || column_index >= client->ncols) return -1;
  *name = client->col_names[column_index];
  *name_len = client->col_name_lens[column_index];
  return 0;
}

int evql_num_columns(evql_client_t* client, size_t* ncols) {
  if (!client->result_valid) return -1;
  *ncols = client->ncols;
  return 0;
}

int evql_discard_result(evql_client_t* client) {
  client->row_cursor = client->nrows;
  if (client->result_valid && !client->islast) {
    /* the server is blocked waiting for CONTINUE/DISCARD after a
     * partial page — release it and swallow its final COMPLETE frame
     * (reference server: ops/query.cc:160-193 DISCARD path) */
    if (send_frame(client->fd, OP_QUERY_DISCARD, 0, NULL, 0)) {
      set_error(client, "send failed", 11);
      return -1;
    }
    if (read_result(client)) return -1;
    client->row_cursor = client->nrows;
  }
  return 0;
}

int evql_next_result(evql_client_t* client) {
  if (!client->result_valid) return -1;
  if (!client->islast) {
    /* reference: client.c evql_next_result errors until the current
     * statement's pages are fully consumed or discarded */
    set_error(client, "current query not finished yet", 30);
    return -1;
  }
  if (!client->pending_stmt) return 0;
  if (send_frame(client->fd, OP_QUERY_NEXT, 0, NULL, 0)) {
    set_error(client, "send failed", 11);
    return -1;
  }
  if (read_result(client)) return -1;
  return 1;
}

const char* evql_client_geterror(evql_client_t* client) {
  return client->error;
}

int evql_client_close(evql_client_t* client) {
  if (client->fd >= 0) {
    send_frame(client->fd, OP_BYE, F_ENDOFREQUEST, NULL, 0);
    close(client->fd);
    client->fd = -1;
  }
  return 0;
}

void evql_client_destroy(evql_client_t* client) {
  evql_client_close(client);
  evql_client_releasebuffers(client);
  free(client->authdata);
  free(client);
}


/* -- options / stats / progress / connectfd --------------------------------
 * (reference: client.c:964-1005 setopt, :1055-1075 connectfd,
 *  :1248-1266 getstat, eventql.h:144-157 option/stat ids) */

int evql_client_setopt(
    evql_client_t* client,
    int opt,
    const char* val,
    size_t val_len,
    long flags) {
  (void)flags;
  switch (opt) {
    case EVQL_CLIENT_OPT_TIMEOUT:
      if (val_len == sizeof(uint64_t)) {
        memcpy(&client->timeout_us, val, sizeof(uint64_t));
        if (client->fd >= 0) {
          struct timeval tv;
          tv.tv_sec = (time_t)(client->timeout_us / 1000000);
          tv.tv_usec = (suseconds_t)(client->timeout_us % 1000000);
          setsockopt(client->fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
          setsockopt(client->fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
        }
        return 0;
      }
      set_error(client, "invalid option value", 20);
      return -1;
    case EVQL_CLIENT_OPT_ROWBUFLEN:
      if (val_len == sizeof(uint64_t)) {
        memcpy(&client->batch_size, val, sizeof(uint64_t));
        return 0;
      }
      set_error(client, "invalid option value", 20);
      return -1;
    default:
      set_error(client, "invalid option", 14);
      return -1;
  }
}

int evql_client_connectfd(evql_client_t* client, int fd, long flags) {
  (void)flags;
  if (client->fd >= 0) {
    close(client->fd);
    client->fd = -1;
  }
  return evql_client_handshake(client, fd);
}

void evql_client_setprogresscb(
    evql_client_t* client,
    void (*cb)(evql_client_t* client, void* privdata),
    void* privdata) {
  client->progress_cb = cb;
  client->progress_cb_opaque = privdata;
}

uint64_t evql_client_getstat(evql_client_t* client, uint64_t stat) {
  switch (stat) {
    case EVQL_STAT_ROWSMODIFIED:
      return client->progress_num_rows_modified;
    case EVQL_STAT_ROWSSCANNED:
      return client->progress_num_rows_scanned;
    case EVQL_STAT_BYTESSCANNED:
      return client->progress_num_bytes_scanned;
    case EVQL_STAT_PROGRESSPERMILL:
      return client->progress_permill;
    case EVQL_STAT_TIMEELAPSED_MS:
      return client->progress_elapsed_ms;
    case EVQL_STAT_ETA_MS:
      return client->progress_eta_ms;
  }
  return 0;
}

/* -- evql_conf: layered key=value config (reference: evql_conf_t,
 * eventql.h:306-345 — defaults <- ini file <- explicit sets) ------------- */

struct evql_conf_s {
  char** keys;
  char** vals;
  size_t n;
  size_t cap;
};

evql_conf_t* evql_conf_init() {
  return (evql_conf_t*)calloc(1, sizeof(evql_conf_t));
}

void evql_conf_free(evql_conf_t* conf) {
  if (!conf) return;
  for (size_t i = 0; i < conf->n; i++) {
    free(conf->keys[i]);
    free(conf->vals[i]);
  }
  free(conf->keys);
  free(conf->vals);
  free(conf);
}

int evql_conf_set(evql_conf_t* conf, const char* key, const char* value) {
  for (size_t i = 0; i < conf->n; i++) {
    if (!strcmp(conf->keys[i], key)) {
      free(conf->vals[i]);
      conf->vals[i] = strdup(value);
      return 0;
    }
  }
  if (conf->n == conf->cap) {
    size_t cap = conf->cap ? conf->cap * 2 : 16;
    char** k = (char**)realloc(conf->keys, cap * sizeof(char*));
    char** v = (char**)realloc(conf->vals, cap * sizeof(char*));
    if (!k || !v) return -1;
    conf->keys = k;
    conf->vals = v;
    conf->cap = cap;
  }
  conf->keys[conf->n] = strdup(key);
  conf->vals[conf->n] = strdup(value);
  conf->n++;
  return 0;
}

const char* evql_conf_get(evql_conf_t* conf, const char* key) {
  for (size_t i = 0; i < conf->n; i++) {
    if (!strcmp(conf->keys[i], key)) return conf->vals[i];
  }
  return NULL;
}

/* load an ini file: "key = value" lines, [section] prefixes keys with
 * "section." (reference parses with inih; same observable mapping) */
int evql_conf_load(evql_conf_t* conf, const char* fpath) {
  FILE* f = fopen(fpath, "r");
  if (!f) return -1;
  char line[4096];
  char section[256] = "";
  while (fgets(line, sizeof(line), f)) {
    char* p = line;
    while (*p == ' ' || *p == '\t') p++;
    if (*p == '#' || *p == ';' || *p == '\n' || *p == '\0') continue;
    if (*p == '[') {
      char* end = strchr(p, ']');
      if (end) {
        size_t len = (size_t)(end - p - 1);
        if (len >= sizeof(section)) len = sizeof(section) - 1;
        memcpy(section, p + 1, len);
        section[len] = '\0';
      }
      continue;
    }
    char* eq = strchr(p, '=');
    if (!eq) continue;
    char* kend = eq;
    while (kend > p && (kend[-1] == ' ' || kend[-1] == '\t')) kend--;
    char key[512];
    size_t klen = (size_t)(kend - p);
    if (*section) {
      snprintf(key, sizeof(key), "%s.%.*s", section, (int)klen, p);
    } else {
      snprintf(key, sizeof(key), "%.*s", (int)klen, p);
    }
    char* v = eq + 1;
    while (*v == ' ' || *v == '\t') v++;
    char* vend = v + strlen(v);
    while (vend > v && (vend[-1] == '\n' || vend[-1] == '\r' ||
                        vend[-1] == ' ' || vend[-1] == '\t')) vend--;
    *vend = '\0';
    if (evql_conf_set(conf, key, v)) {
      fclose(f);
      return -1;
    }
  }
  fclose(f);
  return 0;
}
